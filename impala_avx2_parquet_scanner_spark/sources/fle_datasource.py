"""FLE as an ON-DISK storage format: the `fledir` custom DataSource.

Round 5 re-expressed the reference's FLE codec as verified numpy
(`sources/fle_codec.py` — pack/unpack/skip + BitWeaving kernels); this
module closes the remaining half of the encoding contract by making it a
STORAGE round-trip (FleEncoder::Put/Flush → file → FleDecoder::Get,
fle-encoding.h:8315-9812): executors encode Arrow batches into `.fle`
segment files through the writer half of a registered Spark DataSource,
and the reader half parses the raw bytes back through :func:`fle_unpack`
into vectorized Arrow batches.  The reference ships FLE as a custom
parquet encoding (parquet.thrift:220,224), which would break every other
parquet reader; per SURVEY §4 the engine's parquet files stay standard
RLE_DICTIONARY, and the FLE byte layout lives in its own container —
interop preserved, encode→decode cycle still pinned end-to-end on real
file bytes (`scan_fle_roundtrip`'s DuckDB oracle replays the aggregate
from the raw rows, so one wrong bit anywhere in pack, serialize, parse,
or unpack flips the hash).

Segment layout (little-endian, one segment per input Arrow batch):

    magic  b"FLE1"
    u32    n                      true value count (<= blocks*64)
    u8     qty_width              l_quantity bit width
    u32    n_blocks
    u64[n_blocks*qty_width]       l_quantity plane words (block-major)
    u64[n_blocks]                 validity words (def-level analog —
                                  the reference packs def levels with
                                  the same encoder)
    u16    dict_size              order-preserving l_returnflag dict
    dict_size * (u8 len, bytes)   sorted dictionary entries
    u8     code_width
    u64[n_blocks*code_width]      returnflag code plane words

Scale: encoding runs inside `mapInPandas` Arrow batches on executors
(no driver collect); each segment file is an independent
`InputPartition` on read — the same elasticity as any file source.
The `_DONE` manifest gives the directory parquet-style commit
visibility (uncommitted dirs are unreadable).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
    fle_pack,
    fle_unpack,
    order_preserving_codes,
    pack_validity,
)

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    FLE_DATASOURCE_AVAILABLE = True
except ImportError:  # pragma: no cover - older Spark
    FLE_DATASOURCE_AVAILABLE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


_MAGIC = b"FLE1"
_SCHEMA = "l_returnflag string, l_quantity bigint"


def encode_segment(returnflag: np.ndarray, quantity: np.ndarray) -> bytes:
    """One Arrow batch → one self-contained FLE segment (bytes)."""
    qty = np.asarray(quantity)
    valid = ~np.isnan(qty) if qty.dtype.kind == "f" else np.ones(
        qty.size, dtype=bool
    )
    codes_qty = np.where(valid, qty, 0).astype(np.uint64)
    qty_width = max(int(codes_qty.max()).bit_length(), 1) if codes_qty.size else 1
    qplanes, n = fle_pack(codes_qty, qty_width)
    vwords = pack_validity(valid)
    dictionary, codes = order_preserving_codes(np.asarray(returnflag))
    code_width = max(int(codes.max()).bit_length(), 1) if codes.size else 1
    cplanes, cn = fle_pack(codes, code_width)
    assert cn == n
    parts = [
        _MAGIC,
        struct.pack("<IBI", n, qty_width, qplanes.shape[0]),
        np.ascontiguousarray(qplanes, dtype="<u8").tobytes(),
        np.ascontiguousarray(vwords, dtype="<u8").tobytes(),
        struct.pack("<H", len(dictionary)),
    ]
    for entry in dictionary:
        raw = str(entry).encode("utf-8")
        parts.append(struct.pack("<B", len(raw)) + raw)
    parts.append(struct.pack("<B", code_width))
    parts.append(np.ascontiguousarray(cplanes, dtype="<u8").tobytes())
    return b"".join(parts)


def parse_segment(payload: bytes):
    """Parse a segment's sections WITHOUT decoding any value: returns
    (qty_planes, qty_width, validity_words, dictionary, code_width,
    code_planes, n).  Kernel pushdown runs on these planes directly."""
    if payload[:4] != _MAGIC:
        raise ValueError("fledir: bad segment magic")
    n, qty_width, n_blocks = struct.unpack_from("<IBI", payload, 4)
    off = 4 + 9
    qwords = n_blocks * qty_width
    qplanes = np.frombuffer(payload, "<u8", qwords, off).reshape(
        n_blocks, qty_width
    )
    off += 8 * qwords
    vwords = np.frombuffer(payload, "<u8", n_blocks, off)
    off += 8 * n_blocks
    (dict_size,) = struct.unpack_from("<H", payload, off)
    off += 2
    dictionary = []
    for _ in range(dict_size):
        (ln,) = struct.unpack_from("<B", payload, off)
        off += 1
        dictionary.append(payload[off:off + ln].decode("utf-8"))
        off += ln
    (code_width,) = struct.unpack_from("<B", payload, off)
    off += 1
    cwords = n_blocks * code_width
    cplanes = np.frombuffer(payload, "<u8", cwords, off).reshape(
        n_blocks, code_width
    )
    return qplanes, qty_width, vwords, dictionary, code_width, cplanes, n


def _mask_to_bool(mask: np.ndarray, n: int) -> np.ndarray:
    """Bitset words (one uint64 per 64-value block) → bool[n]."""
    return np.unpackbits(
        mask.astype("<u8").view(np.uint8), bitorder="little"
    )[:n].astype(bool)


def decode_segment(payload: bytes, mask: np.ndarray | None = None):
    """One segment file → (returnflag ndarray[str], quantity int64,
    valid bool ndarray) via the codec's decode path (FleDecoder::Get).
    `mask` (kernel bitset words) restricts the output to matching lanes
    — predicate work already happened on the planes, decode touches
    only survivors' positions."""
    qplanes, qty_width, vwords, dictionary, code_width, cplanes, n = (
        parse_segment(payload)
    )
    qty = fle_unpack(qplanes, qty_width, n).astype(np.int64)
    codes = fle_unpack(cplanes, code_width, n).astype(np.int64)
    rf = np.asarray(dictionary, dtype=object)[codes] if dictionary else (
        np.empty(0, dtype=object)
    )
    lanes = np.arange(n, dtype=np.uint64)
    valid = (
        (vwords[(lanes // 64).astype(np.int64)] >> (lanes % 64))
        & np.uint64(1)
    ).astype(bool)
    if mask is not None:
        keep = _mask_to_bool(mask, n)
        return rf[keep], qty[keep], valid[keep]
    return rf, qty, valid


class _FleFilesPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class FleDirReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("fledir requires option 'path'")
        self.n_parts = int(options.get("numpartitions", 8))
        #: accepted conjuncts [(column, op, value)] — evaluated as
        #: bit-sliced kernels ON THE ENCODED PLANES in read(), before
        #: any decode (the reference's defining behavior:
        #: simple-predicates.h:30-205 evaluated inside the scan on FLE
        #: data, fle-encoding.h:7962-8313)
        self.pushed: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """eq/lt/le/gt/ge/in on either column are accepted and become
        plane-word kernel masks; l_quantity IS NULL / IS NOT NULL rides
        the validity words (the def-level path).  Everything else is
        yielded back as a residual Spark re-evaluates after the scan —
        the pushed-vs-residual conjunct split (§2A #5/#6,
        hdfs-parquet-scanner.cc:1825-1834)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "eq",
            LessThan: "lt",
            LessThanOrEqual: "le",
            GreaterThan: "gt",
            GreaterThanOrEqual: "ge",
            In: "in",
            IsNull: "is_null",
            IsNotNull: "is_not_null",
        }
        for f in filters:
            col = getattr(f, "attribute", None)
            op = ops.get(type(f))
            if op and col in (("l_quantity",), ("l_returnflag",)):
                self.pushed.append(
                    (col[0], op, getattr(f, "value", None))
                )
                continue
            yield f

    def _segment_mask(self, seg) -> "np.ndarray | None":
        """AND together every pushed conjunct's kernel bitset for one
        segment — all work happens on plane words, zero values decoded.
        Returns None when nothing is pushed (decode everything)."""
        if not self.pushed:
            return None
        from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
            FleKernels,
            code_bound,
        )

        qplanes, qty_width, vwords, dictionary, code_width, cplanes, n = seg
        qk = FleKernels(qplanes, qty_width, n, validity=vwords)
        rk = FleKernels(cplanes, code_width, n)
        mask = None

        def _and(m):
            nonlocal mask
            mask = m if mask is None else mask & m

        for col, op, value in self.pushed:
            if col == "l_quantity":
                if op == "is_null":
                    _and(qk.is_null())
                elif op == "is_not_null":
                    _and(qk.is_not_null())
                elif op == "in":
                    _and(qk.in_(tuple(int(v) for v in value)))
                else:
                    _and(getattr(qk, op)(int(value)))
            else:  # l_returnflag via the order-preserving dictionary
                if op == "is_not_null":
                    continue  # returnflag column is never null here
                if op == "is_null":
                    _and(np.zeros(qplanes.shape[0], dtype=np.uint64))
                    continue
                if op == "in":
                    m = np.zeros(qplanes.shape[0], dtype=np.uint64)
                    for v in value:
                        b = code_bound(dictionary, "eq", str(v))
                        if b not in (True, False):
                            m = m | rk.eq(b[1])
                    _and(m)
                    continue
                b = code_bound(dictionary, op, str(value))
                if b is True:
                    continue  # domain short-circuit: all rows pass
                if b is False:
                    _and(np.zeros(qplanes.shape[0], dtype=np.uint64))
                    continue
                _and(getattr(rk, b[0])(b[1]))
        return mask

    def partitions(self):
        done = os.path.join(self.dir, "_DONE")
        if not os.path.exists(done):
            raise ValueError(f"fledir: {self.dir} has no _DONE manifest")
        with open(done) as fh:
            files = [ln for ln in fh.read().splitlines() if ln]
        batches: list[list[str]] = [
            [] for _ in range(min(self.n_parts, max(len(files), 1)))
        ]
        for i, f in enumerate(files):
            batches[i % len(batches)].append(os.path.join(self.dir, f))
        return [_FleFilesPartition(b) for b in batches if b]

    def read(self, partition):
        import pyarrow as pa

        for path in partition.paths:
            with open(path, "rb") as fh:
                payload = fh.read()
            mask = None
            if self.pushed:
                seg = parse_segment(payload)
                mask = self._segment_mask(seg)
                if mask is not None and not mask.any():
                    continue  # whole segment kernel-rejected: zero decode
            rf, qty, valid = decode_segment(payload, mask=mask)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rf, type=pa.string()),
                    pa.array(qty, type=pa.int64(), mask=~valid),
                ],
                names=["l_returnflag", "l_quantity"],
            )


class _FleCommit(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class FleDirWriter(DataSourceWriter):
    """Writer half (§2A #17/#18 for this format): input rows are
    pre-encoded segments (seg_id bigint, payload binary); each task
    persists its payloads as `seg_<id>.fle`, `commit` seals the dir with
    the `_DONE` manifest, `abort` removes this attempt's files."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("fledir requires option 'path'")
        self.overwrite = overwrite

    def write(self, rows):
        os.makedirs(self.dir, exist_ok=True)
        written: list[str] = []
        for row in rows:
            name = f"seg_{row.seg_id}.fle"
            with open(os.path.join(self.dir, name), "wb") as fh:
                fh.write(bytes(row.payload))
            written.append(name)
        return _FleCommit(written)

    def commit(self, messages):
        all_files = sorted(f for m in messages for f in m.files)
        with open(os.path.join(self.dir, "_DONE"), "w") as fh:
            fh.write("\n".join(all_files))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(os.path.join(self.dir, f))
                except OSError:
                    pass


class FleDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fledir"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return FleDirReader(self.options)

    def writer(self, schema, overwrite):
        return FleDirWriter(self.options, overwrite)


def register_fledir(spark) -> None:
    try:
        spark.dataSource.register(FleDataSource)
    except Exception:  # already registered on this session
        pass


def materialize_fle_dir(spark, sf_dir: str) -> str:
    """Write-once: encode lineitem (l_returnflag, NULLIF(l_quantity, 10))
    into `.fle` segments through the fledir WRITER half.  The NULLIF
    derivation stores a genuinely nullable column, so the validity words
    (the def-level analog) round-trip through real file bytes, not just
    in-plan masks.  Encoding happens inside `mapInPandas` Arrow batches
    on the executors; the writer tasks persist their segments and the
    commit seals the `_DONE` manifest."""
    import hashlib as _h

    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    key = _h.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join("/tmp/spark_graft_formats", key, "fle_assets")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out

    def encode(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            qty = pdf["l_quantity"].astype("float64")
            qty_nullable = qty.where(qty != 10.0)  # NaN marks the NULLs
            payload = encode_segment(
                pdf["l_returnflag"].to_numpy(), qty_nullable.to_numpy()
            )
            yield _pd.DataFrame(
                {"seg_id": [pid * 100_000 + i], "payload": [payload]}
            )

    (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    return out
