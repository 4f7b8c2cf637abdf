"""Custom Python DataSource: a user-defined PPM-directory scanner.

The reference's entire identity is a CUSTOM SCANNER registered into a
scan framework — `HdfsParquetScanner` plugged into Impala's scan-node
machinery via the descriptor layer (hdfs-parquet-scanner.h:71-120,
descriptors.h:149-290).  Spark 4's Python DataSource API is the
PySpark-native way to do exactly that: implement `DataSource` /
`DataSourceReader`, register it on the session, and `spark.read
.format(...)` plans it like any built-in source — with partition-parallel
reads (one `InputPartition` per file batch = the reference's scan-range
splits, hdfs-parquet-scanner.cc:111-147) and full Catalyst integration
above the scan.

The scanner here reads a directory of binary PPM (P6) image files —
parsing real bytes off disk with the same header grammar as
`pipeline.multimodal.decode_ppm` — and emits one row per file:
(doc_id from the filename, parsed width/height, raster byte count, and
SHA-256 of the hex-encoded raster).  The fixture images are derived
deterministically from `documents.text`, so the DuckDB oracle replays
every output value from the base table: a hash match proves the custom
scanner read, parsed, and fingerprinted the actual file bytes correctly.

Scale: `partitions()` splits the file listing into fixed batches, each
read independently on an executor — the same elasticity as any file
source; a 10^9-file directory needs only a bigger listing (or a manifest
table driving the partitions).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_avx2_parquet_scanner_spark.catalog import table
from impala_avx2_parquet_scanner_spark.registry import query

try:  # Spark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    DATASOURCE_API_AVAILABLE = True
except ImportError:  # pragma: no cover - older Spark
    DATASOURCE_API_AVAILABLE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass


#: Max image width (pixels); the raster is the first width*3 text bytes.
PPM_MAX_W = 64
PPM_DOC_LIMIT = 200

_SCHEMA = "doc_id bigint, width int, height int, n_raster_bytes bigint, raster_sha string"


class _PpmFilesPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class PpmDirReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("ppmdir requires option 'path'")
        self.n_parts = int(options.get("numPartitions", "8"))

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".ppm")
        )
        batches: list[list[str]] = [[] for _ in range(min(self.n_parts, max(len(files), 1)))]
        for i, f in enumerate(files):
            batches[i % len(batches)].append(os.path.join(self.dir, f))
        return [_PpmFilesPartition(b) for b in batches if b]

    def read(self, partition):
        # real file IO + header parse on the executor, one batch per split
        for path in partition.paths:
            with open(path, "rb") as fh:
                payload = fh.read()
            # P6 header: magic, width, height, maxval, single whitespace
            parts = payload.split(b"\n", 3)
            if parts[0] != b"P6":
                raise ValueError(f"{path}: not a P6 PPM")
            w, h = (int(x) for x in parts[1].split())
            raster = parts[3]
            if len(raster) != w * h * 3:
                raise ValueError(f"{path}: truncated raster")
            doc_id = int(os.path.basename(path)[len("doc_"):-len(".ppm")])
            yield (
                doc_id,
                w,
                h,
                len(raster),
                hashlib.sha256(raster.hex().encode()).hexdigest(),
            )


class PpmDataSource(DataSource):
    @classmethod
    def name(cls):
        return "ppmdir"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return PpmDirReader(self.options)


def materialize_ppm_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write-once: derive one P6 file per document (doc_id < PPM_DOC_LIMIT,
    raster = first width*3 UTF-8 text bytes, height 1) via
    `foreachPartition` — files are written ON THE EXECUTORS, no driver
    collect (in local mode that is still this machine's filesystem; on a
    cluster the target would be a shared mount/object store)."""
    import hashlib as _h

    key = _h.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join("/tmp/spark_graft_formats", key, "ppm_assets")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    rows = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < PPM_DOC_LIMIT)
        .select("doc_id", "text")
    )

    def write_files(it):
        for row in it:
            data = row.text.encode("utf-8")
            w = min(len(data) // 3, PPM_MAX_W)
            if w < 1:
                continue
            raster = data[: w * 3]
            with open(os.path.join(out, f"doc_{row.doc_id}.ppm"), "wb") as fh:
                fh.write(b"P6\n%d 1\n255\n" % w + raster)

    rows.foreachPartition(write_files)
    open(done, "w").close()
    return out


_PPM_DS_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id < {PPM_DOC_LIMIT}
)
SELECT doc_id,
       CAST(LEAST(n // 3, {PPM_MAX_W}) AS INTEGER) AS width,
       CAST(1 AS INTEGER) AS height,
       CAST(LEAST(n // 3, {PPM_MAX_W}) * 3 AS BIGINT) AS n_raster_bytes,
       sha256(substring(hx, 1, LEAST(n // 3, {PPM_MAX_W}) * 6)) AS raster_sha
FROM d WHERE n >= 3
"""


@query(
    "scan_custom_datasource",
    oracle=_PPM_DS_ORACLE,
    tags=("scan", "datasource", "multimodal"),
)
def scan_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-scanner registration end-to-end (the reference's core move,
    re-expressed): materialize real P6 image files from `documents`, then
    read them back through the registered `ppmdir` Python DataSource —
    partition-parallel file scans + header parsing + raster fingerprints,
    value-verified by a DuckDB oracle that recomputes every field from the
    base table."""
    if not DATASOURCE_API_AVAILABLE:
        raise NotImplementedError("Python DataSource API requires Spark >= 4.0")
    path = materialize_ppm_dir(spark, sf_dir)
    try:
        spark.dataSource.register(PpmDataSource)
    except Exception:  # already registered on this session
        pass
    return (
        spark.read.format("ppmdir")
        .option("path", path)
        .option("numPartitions", "8")
        .load()
    )
