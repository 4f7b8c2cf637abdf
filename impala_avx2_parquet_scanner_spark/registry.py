"""Named query registry — the spine of the driver contract.

Every operator this engine implements registers itself here as a
``QuerySpec``: a Spark DataFrame builder plus (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
``__spark_entry__.queries()/oracle_sql()`` are thin adapters over this
registry, and the local test-suite replays the same comparison the
verification driver performs.

Column-name discipline: the driver sorts columns by name and hashes values,
so the Spark builder and the oracle SQL must alias every computed column
identically.

Float discipline: aggregate arithmetic over double columns is performed in
exact DECIMAL and only the *final* value is cast to double.  Exact decimal
sums are order-independent, so Spark's parallel partial aggregation and
DuckDB's sequential scan produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          bench: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle
    }


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in sorted(REGISTRY.items()) if spec.bench}
