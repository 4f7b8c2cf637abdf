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

The container is SCHEMA-GENERAL (round 7): a segment holds N column
sections — unsigned-int plane columns and order-preserving-dictionary
string columns, each independently nullable — matching the reference's
per-column reader model (one scanner per materialized slot,
hdfs-parquet-scanner.cc:1410-1451) instead of the round-6 two-column
demo layout.  Predicate pushdown splits per column exactly like the
reference's per-conjunct routing (simple-predicates.h:30-205).

Segment layout ``FLE2`` (little-endian, one segment per Arrow batch):

    magic  b"FLE2"
    u32    n                   true value count (<= n_blocks*64)
    u32    n_blocks            64-value blocks per plane
    u16    n_cols
    per column:
      u16    name_len,  name bytes (utf-8)
      u8     kind               0 = unsigned int planes, 1 = dict<string>
      u8     nullable           1 → validity words present
      u64[n_blocks]             validity words (def-level analog — the
                                reference packs def levels with the same
                                encoder), only when nullable
      (kind 1) u16 dict_size; dict_size * (u16 len, utf-8 bytes)
                                sorted order-preserving dictionary
      u8     width              bit width of this column's codes
      u64[n_blocks*width]       plane words (block-major)

Scale: encoding runs inside `mapInPandas` Arrow batches on executors
(no driver collect); each segment file is an independent
`InputPartition` on read — the same elasticity as any file source.
The `_DONE` manifest gives the directory parquet-style commit
visibility (uncommitted dirs are unreadable).
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

import numpy as np

from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
    FleKernels,
    code_bound,
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


_MAGIC = b"FLE2"
_STATS_MAGIC = b"BSTA"
_KIND_INT = 0
_KIND_DICT = 1
#: signed int64 column stored as order-preserving OFFSET codes: the
#: section carries an i64 base (the column minimum) and plane codes are
#: ``value - base`` — the "order-preserving offset" the unsigned plane
#: encoding needs for signed domains (dict-encoding.h:393-447's
#: order-preserving remap applied to integers); literals translate by
#: the same subtraction, so every kernel and both stats tiers work
#: unchanged in code space
_KIND_OFFSET = 2
#: blocks per stats chunk: 16 blocks = 1024 values per (min, max) pair —
#: fine enough that a selective range predicate on sorted/clustered data
#: refutes most of a segment, coarse enough that the footer stays ~0.2%
#: of the plane bytes
_CHUNK_BLOCKS = 16
#: fallback read schema when a directory cannot be probed (legacy demo)
_SCHEMA = "l_returnflag string, l_quantity bigint"


def _is_null_cell(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def _has_negative(vals: np.ndarray) -> bool:
    """True iff any non-null lane of a numeric column is negative —
    routes the column to the offset-code kind."""
    v = np.asarray(vals)
    if v.dtype == object:
        return any(
            not _is_null_cell(x)
            and isinstance(x, (int, np.integer, float, np.floating))
            and x < 0
            for x in v
        )
    if v.dtype.kind == "f":
        ok = ~np.isnan(v)
        return bool(ok.any() and (v[ok] < 0).any())
    if v.dtype.kind in ("i",):
        return bool(v.size and v.min() < 0)
    return False


def _encode_int_column(name: str, values: np.ndarray) -> tuple[
    np.ndarray, np.ndarray, int, bool
]:
    """→ (codes uint64, valid bool, width, nullable).  Floats use NaN as
    the NULL marker; valid lanes must be non-negative integral values —
    silent truncation would corrupt the round-trip (a fractional or
    negative input raises instead of storing a wrong value)."""
    vals = np.asarray(values)
    if vals.dtype == object:
        # exact Python-int arithmetic: an object array may hold ints
        # beyond 2^53, where a float64 detour silently rounds to a
        # DIFFERENT value — every lane is range-checked individually
        valid = np.array([not _is_null_cell(v) for v in vals], dtype=bool)
        nullable = bool((~valid).any())
        codes = np.zeros(vals.size, dtype=np.uint64)
        for i in np.flatnonzero(valid):
            v = vals[i]
            if isinstance(v, (float, np.floating)):
                if not float(v).is_integer():
                    raise ValueError(
                        f"fledir: column {name!r} has non-integral values "
                        "— the FLE plane encoding stores unsigned "
                        "integers exactly"
                    )
                iv = int(v)
            else:
                iv = int(v)
            if iv < 0:
                raise ValueError(
                    f"fledir: column {name!r} has negative values — FLE "
                    "plane codes are unsigned (order-preserving offset "
                    "them first)"
                )
            if iv > 0x7FFFFFFFFFFFFFFF:
                # plane storage is u64, but the DataSource decodes to
                # Spark bigint (int64) — a larger value would silently
                # wrap negative on read, so refuse it at encode time
                raise ValueError(
                    f"fledir: column {name!r} exceeds the bigint decode "
                    "range (max 2^63-1)"
                )
            codes[i] = iv
        width = max(int(codes.max()).bit_length(), 1) if codes.size else 1
        return codes, valid, width, nullable
    if vals.dtype.kind == "f":
        valid = ~np.isnan(vals)
        nullable = bool((~valid).any())
    else:
        valid = np.ones(vals.size, dtype=bool)
        nullable = False
    filled = np.where(valid, vals, 0)
    codes = filled.astype(np.uint64)
    if vals.dtype.kind == "f":
        if not np.array_equal(
            codes[valid].astype(np.float64), np.asarray(filled)[valid]
        ):
            raise ValueError(
                f"fledir: column {name!r} has non-integral values — the FLE "
                "plane encoding stores unsigned integers exactly"
            )
    if valid.any() and np.asarray(filled)[valid].min() < 0:
        raise ValueError(
            f"fledir: column {name!r} has negative values — FLE plane "
            "codes are unsigned (order-preserving offset them first)"
        )
    width = max(int(codes.max()).bit_length(), 1) if codes.size else 1
    return codes, valid, width, nullable


def _encode_offset_column(name: str, values: np.ndarray) -> tuple[
    np.ndarray, np.ndarray, int, int, bool
]:
    """→ (codes uint64, valid bool, base i64, width, nullable) for a
    SIGNED integer column: codes are ``value - base`` (base = column
    minimum), computed in modular u64 arithmetic so any int64 span up
    to 2^64-1 round-trips exactly (two's complement in, two's
    complement out)."""
    vals = np.asarray(values)
    if vals.dtype == object:
        valid = np.array([not _is_null_cell(v) for v in vals], dtype=bool)
        ints = np.zeros(vals.size, dtype=np.int64)
        for i in np.flatnonzero(valid):
            v = vals[i]
            if isinstance(v, (float, np.floating)):
                if not float(v).is_integer():
                    raise ValueError(
                        f"fledir: column {name!r} has non-integral values "
                        "— the FLE plane encoding stores integers exactly"
                    )
                v = int(v)
            iv = int(v)
            if not (-(2**63) <= iv <= 2**63 - 1):
                raise ValueError(
                    f"fledir: column {name!r} exceeds the bigint decode "
                    "range"
                )
            ints[i] = iv
    elif vals.dtype.kind == "f":
        valid = ~np.isnan(vals)
        filled = np.where(valid, vals, 0.0)
        ints = filled.astype(np.int64)
        if not np.array_equal(
            ints[valid].astype(np.float64), filled[valid]
        ):
            raise ValueError(
                f"fledir: column {name!r} has non-integral values — the "
                "FLE plane encoding stores integers exactly"
            )
    else:
        valid = np.ones(vals.size, dtype=bool)
        ints = vals.astype(np.int64)
    nullable = bool((~valid).any())
    base = int(ints[valid].min()) if valid.any() else 0
    # modular subtraction: (value - base) mod 2^64 is the exact
    # non-negative offset for any int64 pair, and order-preserving
    # because base is the minimum
    codes = (
        ints.view(np.uint64) - np.uint64(base & 0xFFFFFFFFFFFFFFFF)
    )
    codes = np.where(valid, codes, np.uint64(0))
    width = (
        max(int(codes[valid].max()).bit_length(), 1) if valid.any() else 1
    )
    return codes.astype(np.uint64), valid, base, width, nullable


def _encode_dict_column(values: np.ndarray) -> tuple[
    np.ndarray, np.ndarray, list[str], int, bool
]:
    """→ (codes uint64, valid bool, dictionary, width, nullable)."""
    vals = np.asarray(values, dtype=object)
    valid = np.array([not _is_null_cell(v) for v in vals], dtype=bool)
    nullable = bool((~valid).any())
    if valid.any():
        fill = vals[valid][0]
        work = np.where(valid, vals, fill)
        dictionary, codes = order_preserving_codes(work.astype(str))
        dict_list = [str(d) for d in dictionary]
    else:
        dict_list, codes = [], np.zeros(vals.size, dtype=np.uint64)
    width = max(int(codes.max()).bit_length(), 1) if codes.size else 1
    return codes.astype(np.uint64), valid, dict_list, width, nullable


def _chunk_min_max(
    codes: np.ndarray, valid: np.ndarray, n_blocks: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-chunk (min, max) over VALID lanes in code space — the
    page-level statistics analog (the reference keeps row-group AND page
    stats; file-level lives in the manifest, this is the within-file
    tier).  All-NULL chunks get the empty interval (u64max, 0), which no
    comparison candidate test intersects."""
    chunk_vals = _CHUNK_BLOCKS * 64
    n_chunks = (n_blocks + _CHUNK_BLOCKS - 1) // _CHUNK_BLOCKS
    cap = n_chunks * chunk_vals
    lo = np.full(cap, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    hi = np.zeros(cap, dtype=np.uint64)
    idx = np.flatnonzero(valid)
    lo[idx] = codes[idx]
    hi[idx] = codes[idx]
    mins = lo.reshape(n_chunks, chunk_vals).min(axis=1)
    maxs = hi.reshape(n_chunks, chunk_vals).max(axis=1)
    return mins, maxs


def encode_segment_columns(columns: list[tuple[str, np.ndarray]]) -> bytes:
    """N named arrays (one Arrow batch) → one self-contained FLE segment.

    Column kind is inferred from dtype: string/object arrays become
    order-preserving dictionary columns, numeric arrays become unsigned
    int plane columns (NaN marks NULL in float input).  Dictionary
    entries carry a u16 length prefix, so entries up to 65535 UTF-8
    bytes round-trip (longer raises a clear error).  A trailing BSTA
    footer carries per-chunk code-space min/max for every column, so the
    reader's kernels can skip plane words mid-file (older readers stop
    after the column sections and never see it)."""
    if not columns:
        raise ValueError("fledir: segment needs at least one column")
    n = int(np.asarray(columns[0][1]).size)
    parts: list[bytes] = []
    chunk_sections: list[bytes] = []
    n_blocks = None
    for name, values in columns:
        vals = np.asarray(values)
        if vals.size != n:
            raise ValueError("fledir: ragged columns in one segment")
        if vals.dtype.kind in ("U", "S"):
            is_dict = True
        elif vals.dtype == object:
            # object arrays hold strings (→ dict) unless every non-null
            # cell is numeric (→ int planes); empty defaults to dict
            non_null = [v for v in vals if not _is_null_cell(v)]
            is_dict = not non_null or not all(
                isinstance(v, (int, np.integer, float, np.floating))
                for v in non_null
            )
        else:
            is_dict = False
        base = None
        if is_dict:
            codes, valid, dictionary, width, nullable = (
                _encode_dict_column(vals)
            )
            kind = _KIND_DICT
        elif _has_negative(vals):
            codes, valid, base, width, nullable = _encode_offset_column(
                name, vals
            )
            dictionary = None
            kind = _KIND_OFFSET
        else:
            codes, valid, width, nullable = _encode_int_column(name, vals)
            dictionary = None
            kind = _KIND_INT
        planes, pn = fle_pack(codes, width)
        assert pn == n
        raw_name = name.encode("utf-8")
        sec = [struct.pack("<H", len(raw_name)), raw_name,
               struct.pack("<BB", kind, 1 if nullable else 0)]
        if nullable:
            sec.append(
                np.ascontiguousarray(pack_validity(valid), "<u8").tobytes()
            )
        if is_dict:
            sec.append(struct.pack("<H", len(dictionary)))
            for entry in dictionary:
                raw = entry.encode("utf-8")
                if len(raw) > 0xFFFF:
                    raise ValueError(
                        "fledir: dictionary entry exceeds 65535 UTF-8 "
                        "bytes — not representable in the segment format"
                    )
                sec.append(struct.pack("<H", len(raw)) + raw)
        if kind == _KIND_OFFSET:
            sec.append(struct.pack("<q", base))
        sec.append(struct.pack("<B", width))
        sec.append(np.ascontiguousarray(planes, "<u8").tobytes())
        if n_blocks is None:
            n_blocks = planes.shape[0]
        parts.append(b"".join(sec))
        mins, maxs = _chunk_min_max(codes, valid, planes.shape[0])
        chunk_sections.append(
            struct.pack("<I", mins.size)
            + np.ascontiguousarray(mins, "<u8").tobytes()
            + np.ascontiguousarray(maxs, "<u8").tobytes()
        )
    header = _MAGIC + struct.pack(
        "<IIH", n, n_blocks if n_blocks is not None else 0, len(columns)
    )
    footer = (
        _STATS_MAGIC
        + struct.pack("<HH", _CHUNK_BLOCKS, len(columns))
        + b"".join(chunk_sections)
    )
    return header + b"".join(parts) + footer


def encode_segment(returnflag: np.ndarray, quantity: np.ndarray) -> bytes:
    """Legacy two-column demo layout (round-6 surface, kept for the
    `scan_fle_roundtrip`/`scan_fle_pushdown` contract): one Arrow batch
    of (l_returnflag, l_quantity) → one segment."""
    return encode_segment_columns(
        [("l_returnflag", returnflag), ("l_quantity", quantity)]
    )


@dataclass
class ParsedColumn:
    name: str
    kind: int
    nullable: bool
    validity: np.ndarray | None  # u64 words, None → all valid
    dictionary: list[str] | None  # kind 1 only
    width: int
    planes: np.ndarray  # (n_blocks, width) u64
    base: int = 0  # kind 2 only: value = base + code


@dataclass
class ParsedSegment:
    n: int
    n_blocks: int
    columns: list[ParsedColumn]
    #: per-chunk code-space stats footer (round 8): chunk_stats[i] is
    #: (mins u64[n_chunks], maxs u64[n_chunks]) for columns[i], each
    #: chunk covering `chunk_blocks` 64-value blocks; an all-NULL chunk
    #: carries the empty interval (u64max, 0).  None on pre-footer files.
    chunk_blocks: int = 0
    chunk_stats: "list[tuple[np.ndarray, np.ndarray]] | None" = None

    def column(self, name: str) -> ParsedColumn:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)


def parse_segment(payload: bytes) -> ParsedSegment:
    """Parse a segment's sections WITHOUT decoding any value.  Kernel
    pushdown runs on the returned plane/validity words directly."""
    if payload[:4] != _MAGIC:
        raise ValueError("fledir: bad segment magic")
    n, n_blocks, n_cols = struct.unpack_from("<IIH", payload, 4)
    off = 4 + 10
    cols: list[ParsedColumn] = []
    for _ in range(n_cols):
        (name_len,) = struct.unpack_from("<H", payload, off)
        off += 2
        name = payload[off:off + name_len].decode("utf-8")
        off += name_len
        kind, nullable = struct.unpack_from("<BB", payload, off)
        off += 2
        validity = None
        if nullable:
            validity = np.frombuffer(payload, "<u8", n_blocks, off)
            off += 8 * n_blocks
        dictionary = None
        if kind == _KIND_DICT:
            (dict_size,) = struct.unpack_from("<H", payload, off)
            off += 2
            dictionary = []
            for _ in range(dict_size):
                (ln,) = struct.unpack_from("<H", payload, off)
                off += 2
                dictionary.append(payload[off:off + ln].decode("utf-8"))
                off += ln
        base = 0
        if kind == _KIND_OFFSET:
            (base,) = struct.unpack_from("<q", payload, off)
            off += 8
        (width,) = struct.unpack_from("<B", payload, off)
        off += 1
        words = n_blocks * width
        planes = np.frombuffer(payload, "<u8", words, off).reshape(
            n_blocks, width
        )
        off += 8 * words
        cols.append(ParsedColumn(
            name=name, kind=kind, nullable=bool(nullable),
            validity=validity, dictionary=dictionary, width=width,
            planes=planes, base=base,
        ))
    chunk_blocks, chunk_stats = 0, None
    if payload[off:off + 4] == _STATS_MAGIC:
        off += 4
        chunk_blocks, stat_cols = struct.unpack_from("<HH", payload, off)
        off += 4
        chunk_stats = []
        for _ in range(stat_cols):
            (n_chunks,) = struct.unpack_from("<I", payload, off)
            off += 4
            mins = np.frombuffer(payload, "<u8", n_chunks, off)
            off += 8 * n_chunks
            maxs = np.frombuffer(payload, "<u8", n_chunks, off)
            off += 8 * n_chunks
            chunk_stats.append((mins, maxs))
        if chunk_blocks == 0:
            # degenerate footer (foreign writer): stats that cannot map
            # to blocks must never refute — fall back to full kernels
            chunk_stats = None
    return ParsedSegment(
        n=n, n_blocks=n_blocks, columns=cols,
        chunk_blocks=chunk_blocks, chunk_stats=chunk_stats,
    )


def _lane_validity(col: ParsedColumn, n: int) -> np.ndarray:
    if col.validity is None:
        return np.ones(n, dtype=bool)
    lanes = np.arange(n, dtype=np.uint64)
    return (
        (col.validity[(lanes // 64).astype(np.int64)] >> (lanes % 64))
        & np.uint64(1)
    ).astype(bool)


def decode_segment_columns(
    seg: ParsedSegment,
    mask: np.ndarray | None = None,
    columns: "list[str] | None" = None,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Parsed segment → {name: (values, valid)} via the codec's decode
    path (FleDecoder::Get).  Accepts the ALREADY-PARSED segment so the
    pushdown path parses each file exactly once (mask kernels ran on the
    same parse).  `mask` (kernel bitset words) restricts output to
    matching lanes — and decode SKIPS whole 64-value blocks whose mask
    word is zero (the bitset-driven skip loop, hdfs-parquet-scanner.cc:
    1006-1038 + fle-encoding.h:344-402's O(1) Skip): on clustered data a
    selective predicate decodes only the surviving blocks' plane words,
    not the segment.  `columns` restricts decode to those names
    (projection pruning — unreferenced plane sections never unpack)."""
    decode_cols = (
        seg.columns
        if columns is None
        else [c for c in seg.columns if c.name in columns]
    )
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if mask is None:
        for c in decode_cols:
            codes = fle_unpack(c.planes, c.width, seg.n)
            valid = _lane_validity(c, seg.n)
            vals = _codes_to_values(c, codes, seg.n)
            out[c.name] = (vals, valid)
        return out

    live = np.flatnonzero(mask)  # surviving block indices, ascending
    # per-lane keep bits over ONLY the surviving blocks (kernel tail
    # masks already zeroed padding lanes, so no n-clipping needed here)
    keep = np.unpackbits(
        mask[live].astype("<u8").view(np.uint8), bitorder="little"
    ).astype(bool)
    n_sub = live.size * 64
    for c in decode_cols:
        if live.size == 0:
            empty_vals = (
                np.empty(0, dtype=object)
                if c.kind == _KIND_DICT
                else np.empty(0, dtype=np.int64)
            )
            out[c.name] = (empty_vals, np.empty(0, dtype=bool))
            continue
        codes = fle_unpack(c.planes[live], c.width, n_sub)[keep]
        if c.validity is None:
            valid = np.ones(codes.size, dtype=bool)
        else:
            vbits = np.unpackbits(
                c.validity[live].astype("<u8").view(np.uint8),
                bitorder="little",
            ).astype(bool)
            valid = vbits[keep]
        vals = _codes_to_values(c, codes, codes.size)
        out[c.name] = (vals, valid)
    return out


def _codes_to_values(
    c: ParsedColumn, codes: np.ndarray, n: int
) -> np.ndarray:
    if c.kind == _KIND_DICT:
        return (
            np.asarray(c.dictionary, dtype=object)[codes.astype(np.int64)]
            if c.dictionary
            else np.full(n, None, dtype=object)
        )
    if c.kind == _KIND_OFFSET:
        # modular add then two's-complement view: exact for any int64
        # base + code pair the encoder accepted
        return (
            codes.astype(np.uint64)
            + np.uint64(c.base & 0xFFFFFFFFFFFFFFFF)
        ).view(np.int64)
    return codes.astype(np.int64)


def decode_segment(payload: bytes, mask: np.ndarray | None = None):
    """Legacy two-column helper: one segment's bytes → (returnflag
    ndarray[str], quantity int64, quantity-valid bool ndarray)."""
    cols = decode_segment_columns(parse_segment(payload), mask=mask)
    rf, _ = cols["l_returnflag"]
    qty, qvalid = cols["l_quantity"]
    return rf, qty, qvalid


class _FleFilesPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


_PUSHABLE_OPS = {
    "EqualTo": "eq",
    "LessThan": "lt",
    "LessThanOrEqual": "le",
    "GreaterThan": "gt",
    "GreaterThanOrEqual": "ge",
    "In": "in",
    "IsNull": "is_null",
    "IsNotNull": "is_not_null",
}


class FleDirReader(DataSourceReader):
    def __init__(self, options, wanted: "list[str] | None" = None):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("fledir requires option 'path'")
        self.n_parts = int(options.get("numpartitions", 8))
        #: column names the output batches must carry (None → all, in
        #: segment order).  Pushed-filter columns outside this set still
        #: have their KERNELS evaluated (mask work needs no decode) —
        #: only the decode + Arrow materialization is pruned.
        self.wanted = wanted
        #: accepted conjuncts [(column, op, value)] — evaluated as
        #: bit-sliced kernels ON THE ENCODED PLANES in read(), before
        #: any decode (the reference's defining behavior:
        #: simple-predicates.h:30-205 evaluated inside the scan on FLE
        #: data, fle-encoding.h:7962-8313); the conjunct→column routing
        #: mirrors the per-slot scanner split
        #: (hdfs-parquet-scanner.cc:1410-1451)
        self.pushed: list[tuple[str, str, object]] = []

    @staticmethod
    def _literal_pushable(op: str, value) -> bool:
        """A fractional numeric literal must stay RESIDUAL: the int
        kernels (and the manifest-stat refutation) compare in integer
        space, so int(10.5) would silently answer x<10 instead of
        x<10.5.  Catalyst blocks such pushes behind casts, but a direct
        DSv2 caller can hand one over — keep it for Spark to re-check."""
        def ok(v) -> bool:
            return not (
                isinstance(v, (float, np.floating))
                and not float(v).is_integer()
            )

        if op == "in":
            return value is not None and all(ok(v) for v in value)
        return ok(value)

    def pushFilters(self, filters):
        """eq/lt/le/gt/ge/in on any stored column are accepted and
        become plane-word kernel masks (string columns translate
        through their order-preserving dictionary, dict-encoding.h:
        461-541); IS NULL / IS NOT NULL ride the validity words (the
        def-level path).  Everything else — including comparisons whose
        literal is not exactly integral — is yielded back as a residual
        Spark re-evaluates after the scan — the pushed-vs-residual
        conjunct split (§2A #5/#6, hdfs-parquet-scanner.cc:1825-1834)."""
        for f in filters:
            col = getattr(f, "attribute", None)
            op = _PUSHABLE_OPS.get(type(f).__name__)
            value = getattr(f, "value", None)
            if (
                op
                and isinstance(col, tuple)
                and len(col) == 1
                and self._literal_pushable(op, value)
            ):
                self.pushed.append((col[0], op, value))
                continue
            yield f

    @staticmethod
    def _chunk_kernel(
        seg: ParsedSegment, c: ParsedColumn, col_idx: int,
        codeop: str, arg,
    ) -> np.ndarray:
        """Evaluate one code-space comparison kernel over a column,
        SKIPPING chunks the per-chunk stats footer provably refutes —
        the mid-file analog of the manifest's file-level pruning (the
        reference's page-level statistics vs its row-group level;
        hdfs-parquet-scanner.cc:1125-1132's all-false batch skip).
        Refuted chunks contribute zero mask words WITHOUT their plane
        words ever being read; the kernel runs only on candidate
        blocks.  Falls back to the full-planes kernel on pre-footer
        segments."""
        stats = seg.chunk_stats
        if stats is None or col_idx >= len(stats):
            k = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
            return k.in_(arg) if codeop == "in" else getattr(k, codeop)(arg)
        mins, maxs = stats[col_idx]
        if codeop == "in":
            cand = np.zeros(mins.size, dtype=bool)
            for v in arg:
                # out-of-u64-domain literals can match nothing (the
                # kernel's domain short-circuit agrees) — no candidates
                if 0 <= v <= 0xFFFFFFFFFFFFFFFF:
                    u = np.uint64(v)
                    cand |= (mins <= u) & (maxs >= u)
        else:
            if arg < 0:
                # codes are unsigned: only gt/ge can match anything
                cand = (
                    np.ones(mins.size, dtype=bool)
                    if codeop in ("gt", "ge")
                    else np.zeros(mins.size, dtype=bool)
                )
            elif arg > 0xFFFFFFFFFFFFFFFF:
                # above the u64 code domain: lt/le match every valid row
                # (chunks with any valid lane have min <= max), eq/gt/ge
                # match none — mirrors the kernels' domain short-circuit
                cand = (
                    mins <= maxs
                    if codeop in ("lt", "le")
                    else np.zeros(mins.size, dtype=bool)
                )
            else:
                u = np.uint64(arg)
                cand = {
                    "eq": (mins <= u) & (maxs >= u),
                    "lt": mins < u,
                    "le": mins <= u,
                    "gt": maxs > u,
                    "ge": maxs >= u,
                }[codeop]
        nb = seg.n_blocks
        out = np.zeros(nb, dtype=np.uint64)
        if not cand.any():
            return out
        block_cand = np.repeat(cand, seg.chunk_blocks)[:nb]
        live = np.flatnonzero(block_cand)
        if live.size == nb:  # nothing refuted: skip the gather copy
            k = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
            return k.in_(arg) if codeop == "in" else getattr(k, codeop)(arg)
        # subset value count: only the GLOBAL last block carries padding
        tail = seg.n - (nb - 1) * 64
        n_sub = (
            (live.size - 1) * 64 + tail
            if live[-1] == nb - 1
            else live.size * 64
        )
        k = FleKernels(
            c.planes[live], c.width, n_sub,
            validity=None if c.validity is None else c.validity[live],
        )
        m = k.in_(arg) if codeop == "in" else getattr(k, codeop)(arg)
        out[live] = m
        return out

    def _segment_mask(self, seg: ParsedSegment) -> "np.ndarray | None":
        """AND together every pushed conjunct's kernel bitset for one
        segment — all work happens on plane words, zero values decoded
        (comparisons additionally skip stat-refuted chunks entirely).
        Returns None when nothing constrains the segment (decode all)."""
        if not self.pushed:
            return None
        mask = None

        def _and(m):
            nonlocal mask
            mask = m if mask is None else mask & m

        zeros = np.zeros(seg.n_blocks, dtype=np.uint64)
        cols = {c.name: c for c in seg.columns}
        col_idx = {c.name: i for i, c in enumerate(seg.columns)}
        for col_name, op, value in self.pushed:
            c = cols.get(col_name)
            if c is None:
                # pushFilters already CONSUMED this conjunct (it is not a
                # residual), so silently skipping it would return
                # unfiltered rows — fail loudly instead: heterogeneous
                # segment schemas are outside the format contract
                raise ValueError(
                    f"fledir: pushed filter references column "
                    f"{col_name!r} absent from a segment — heterogeneous "
                    "segment schemas are not supported"
                )
            i = col_idx[col_name]
            if op == "is_null":
                k = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
                _and(k.is_null())
            elif op == "is_not_null":
                if c.validity is None:
                    continue  # non-nullable: all rows qualify
                k = FleKernels(c.planes, c.width, seg.n, validity=c.validity)
                _and(k.is_not_null())
            elif c.kind in (_KIND_INT, _KIND_OFFSET):
                # offset columns translate the literal into code space
                # by the same subtraction the encoder applied — the
                # order-preserving remap, so every comparison kernel
                # works unchanged (out-of-range results go through the
                # kernels' domain short-circuits)
                shift = c.base if c.kind == _KIND_OFFSET else 0
                if op == "in":
                    _and(self._chunk_kernel(
                        seg, c, i, "in",
                        tuple(int(v) - shift for v in value),
                    ))
                else:
                    _and(self._chunk_kernel(
                        seg, c, i, op, int(value) - shift
                    ))
            else:  # dictionary column: literal → code space
                if op == "in":
                    codes = [
                        b[1]
                        for v in value
                        for b in (code_bound(
                            np.asarray(c.dictionary), "eq", str(v)
                        ),)
                        if b not in (True, False)
                    ]
                    _and(
                        self._chunk_kernel(seg, c, i, "in", tuple(codes))
                        if codes
                        else zeros.copy()
                    )
                    continue
                b = code_bound(np.asarray(c.dictionary), op, str(value))
                if b is True:
                    # domain short-circuit: every VALID row passes (a
                    # NULL lane still satisfies no comparison)
                    if c.validity is not None:
                        k = FleKernels(
                            c.planes, c.width, seg.n, validity=c.validity
                        )
                        _and(k.is_not_null())
                    continue
                if b is False:
                    _and(zeros.copy())
                    continue
                _and(self._chunk_kernel(seg, c, i, b[0], b[1]))
        return mask

    def _stats_refute(self, stats: dict) -> bool:
        """True iff the pushed conjunction PROVABLY matches no row of a
        segment given its manifest stats — the parquet footer min/max
        row-group skip (hdfs-parquet-scanner.cc:1006-1038) at file
        granularity, decided on the DRIVER before any scan task exists."""
        for col, op, value in self.pushed:
            s = stats.get(col)
            if not isinstance(s, dict):
                continue  # stat-less column: cannot refute
            mn, mx, has_null = s.get("min"), s.get("max"), s.get("has_null")
            if op == "is_null":
                if has_null is False:
                    return True
                continue
            if mn is None or mx is None:  # every lane NULL
                return True  # is_not_null and all comparisons fail
            if op == "is_not_null":
                continue
            conv = str if isinstance(mn, str) else int
            try:
                if op == "in":
                    vs = [conv(v) for v in value]
                    if all(v < mn or v > mx for v in vs):
                        return True
                    continue
                v = conv(value)
            except (TypeError, ValueError):
                continue  # untranslatable literal: cannot refute
            if (
                (op == "eq" and (v < mn or v > mx))
                or (op == "lt" and mn >= v)
                or (op == "le" and mn > v)
                or (op == "gt" and mx <= v)
                or (op == "ge" and mx < v)
            ):
                return True
        return False

    def partitions(self):
        done = os.path.join(self.dir, "_DONE")
        if not os.path.exists(done):
            raise ValueError(f"fledir: {self.dir} has no _DONE manifest")
        files: list[str] = []
        with open(done) as fh:
            for ln in fh.read().splitlines():
                if not ln:
                    continue
                # manifest line: "name" or "name\t{json per-column stats}"
                name, _, stats_json = ln.partition("\t")
                if stats_json and self.pushed:
                    import json as _json

                    try:
                        stats = _json.loads(stats_json)
                    except ValueError:
                        stats = None
                    if stats and self._stats_refute(stats):
                        continue  # whole file pruned: never opened
                files.append(name)
        batches: list[list[str]] = [
            [] for _ in range(min(self.n_parts, max(len(files), 1)))
        ]
        for i, f in enumerate(files):
            batches[i % len(batches)].append(os.path.join(self.dir, f))
        parts = [_FleFilesPartition(b) for b in batches if b]
        # every file stat-pruned: one empty partition (a zero-partition
        # scan is not representable)
        return parts or [_FleFilesPartition([])]

    def read(self, partition):
        import pyarrow as pa

        for path in partition.paths:
            with open(path, "rb") as fh:
                payload = fh.read()
            # parse ONCE: the same parsed sections feed both the kernel
            # mask and the decode (no byte is re-parsed)
            seg = parse_segment(payload)
            mask = self._segment_mask(seg)
            if mask is not None and not mask.any():
                continue  # whole segment kernel-rejected: zero decode
            out_cols = [
                c for c in seg.columns
                if self.wanted is None or c.name in self.wanted
            ]
            cols = decode_segment_columns(
                seg, mask=mask,
                columns=[c.name for c in out_cols],
            )
            arrays, names = [], []
            for c in out_cols:
                vals, valid = cols[c.name]
                if c.kind == _KIND_DICT:
                    arr = pa.array(
                        vals, type=pa.string(),
                        mask=~valid if c.nullable else None,
                    )
                else:
                    arr = pa.array(
                        vals, type=pa.int64(),
                        mask=~valid if c.nullable else None,
                    )
                arrays.append(arr)
                names.append(c.name)
            yield pa.RecordBatch.from_arrays(arrays, names=names)


def segment_stats(seg: ParsedSegment) -> dict:
    """Per-column {min, max, has_null} for the manifest — min/max of int
    columns computed ON THE PLANES by :func:`plane_min_max` (no decode);
    dict columns read the sorted dictionary's endpoints.  The parquet
    footer-stats analog the reader's `partitions()` prunes files with."""
    from impala_avx2_parquet_scanner_spark.sources.fle_codec import (
        plane_min_max,
        popcount,
    )

    out: dict[str, dict] = {}
    for c in seg.columns:
        if c.validity is None:
            n_valid = seg.n
        else:
            v = c.validity.copy()
            rem = seg.n % 64
            if v.size and rem:
                v[-1] &= np.uint64((1 << rem) - 1)
            n_valid = popcount(v)
        has_null = n_valid < seg.n
        if n_valid == 0:
            out[c.name] = {"min": None, "max": None, "has_null": has_null}
            continue
        if c.kind == _KIND_DICT:
            # order-preserving dictionary: value order == code order, so
            # the string min/max are the dictionary endpoints IF both
            # endpoint codes occur; plane_min_max gives the occurring
            # code range without decoding
            cr = plane_min_max(c.planes, c.width, seg.n, validity=c.validity)
            mn, mx = c.dictionary[cr[0]], c.dictionary[cr[1]]
        else:
            mn, mx = plane_min_max(
                c.planes, c.width, seg.n, validity=c.validity
            )
            if c.kind == _KIND_OFFSET:
                # manifest stats live in VALUE space so the driver can
                # refute with the query's original literals
                mn, mx = c.base + mn, c.base + mx
        out[c.name] = {"min": mn, "max": mx, "has_null": has_null}
    return out


class _FleCommit(WriterCommitMessage):
    def __init__(self, files: list[str], stats: list[str],
                 tmps: "list[str] | None" = None):
        self.files = files
        self.stats = stats
        self.tmps = tmps or []


def _clear_segments(path: str) -> None:
    """Remove every segment file + manifest under `path` (unsealed-retry
    hygiene — stale seg_*.fle / task temp files from a crashed attempt
    or a previous layout must not survive into a new write)."""
    if not os.path.isdir(path):
        return
    for f in os.listdir(path):
        if f.endswith(".fle") or f == "_DONE" or ".fle.tmp-" in f:
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass


def _manifest_entries(path: str) -> list[tuple[str, str]]:
    """(name, stats-json) pairs of the committed manifest, [] if none."""
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        return []
    out = []
    with open(done) as fh:
        for ln in fh.read().splitlines():
            if ln:
                name, _, s = ln.partition("\t")
                out.append((name, s))
    return out


class FleDirWriter(DataSourceWriter):
    """Writer half (§2A #17/#18 for this format): input rows are
    pre-encoded segments (seg_id bigint, payload binary).  Each task
    persists its payloads under TEMP names (`seg_<id>.fle.tmp-<token>`
    — invisible to both reader halves, which list `.fle` / manifest
    names only), so a half-written or aborted attempt can never be
    observed.  `commit` renames every temp into its final `seg_<id>.fle`
    name, seals the dir by atomically replacing the `_DONE` manifest
    (append mode merges the previous manifest), and ONLY THEN — for
    mode('overwrite') — removes the stale previous segments: a failed
    or aborted overwrite leaves the old committed data fully readable."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("fledir requires option 'path'")
        self.overwrite = overwrite

    def write(self, rows):
        import json as _json
        import uuid as _uuid

        os.makedirs(self.dir, exist_ok=True)
        token = _uuid.uuid4().hex[:12]
        written: list[str] = []
        tmps: list[str] = []
        stats: list[str] = []
        for row in rows:
            name = f"seg_{row.seg_id}.fle"
            tmp = f"{name}.tmp-{token}"
            payload = bytes(row.payload)
            with open(os.path.join(self.dir, tmp), "wb") as fh:
                fh.write(payload)
            written.append(name)
            tmps.append(tmp)
            # per-segment column stats, computed on the encoded planes
            # (no decode) — carried to the manifest at commit
            stats.append(_json.dumps(segment_stats(parse_segment(payload))))
        return _FleCommit(written, stats, tmps)

    def commit(self, messages):
        previous = _manifest_entries(self.dir)
        new_entries: list[tuple[str, str]] = []
        for m in messages:
            tmps = getattr(m, "tmps", None) or m.files
            stats = getattr(m, "stats", [""] * len(m.files))
            for name, tmp, s in zip(m.files, tmps, stats):
                os.replace(
                    os.path.join(self.dir, tmp),
                    os.path.join(self.dir, name),
                )
                new_entries.append((name, s))
        new_names = {n for n, _ in new_entries}
        if not self.overwrite:
            # append: previous committed segments stay in the manifest
            # (a re-written name takes this attempt's entry)
            new_entries += [
                (n, s) for n, s in previous if n not in new_names
            ]
        entries = sorted(new_entries)
        done = os.path.join(self.dir, "_DONE")
        tmp_done = done + ".tmp"
        with open(tmp_done, "w") as fh:
            fh.write("\n".join(
                f"{name}\t{s}" if s else name for name, s in entries
            ))
        os.replace(tmp_done, done)  # atomic manifest swap
        if self.overwrite:
            # destruction happens ONLY after the new _DONE is durable:
            # sweep every .fle not in the new manifest (covers stale
            # committed segments AND unsealed leftovers from crashes)
            keep = {n for n, _ in entries}
            for f in os.listdir(self.dir):
                if f.endswith(".fle") and f not in keep:
                    try:
                        os.remove(os.path.join(self.dir, f))
                    except OSError:
                        pass

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in getattr(m, "tmps", None) or m.files:
                try:
                    os.remove(os.path.join(self.dir, f))
                except OSError:
                    pass


def infer_fledir_schema(path: str) -> str | None:
    """Probe the first committed segment's header for the stored column
    names/kinds → Spark DDL (the footer-schema read the parquet path
    gets for free; here the segment header is the footer)."""
    try:
        done = os.path.join(path, "_DONE")
        with open(done) as fh:
            first = next(
                ln.partition("\t")[0] for ln in fh.read().splitlines() if ln
            )
        with open(os.path.join(path, first), "rb") as fh:
            seg = parse_segment(fh.read())
        return ", ".join(
            f"{c.name} {'string' if c.kind == _KIND_DICT else 'bigint'}"
            for c in seg.columns
        )
    except Exception:
        return None


class FleDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fledir"

    def schema(self):
        path = self.options.get("path")
        inferred = infer_fledir_schema(path) if path else None
        return inferred or _SCHEMA

    def reader(self, schema):
        # `schema` is what the query will consume: either the inferred
        # full schema or a user-supplied SUBSET (spark.read.schema(...)).
        # Passing its field names lets the reader decode ONLY those
        # columns' plane sections — projection pruning for this format
        # (§2A #4's one-reader-per-materialized-slot,
        # hdfs-parquet-scanner.cc:1410-1451: unreferenced columns never
        # materialize)
        wanted = [f.name for f in schema.fields] if schema else None
        return FleDirReader(self.options, wanted=wanted)

    def writer(self, schema, overwrite):
        return FleDirWriter(self.options, overwrite)


try:  # streaming half (Spark >= 4.0)
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class FleStreamReader(SimpleDataSourceStreamReader):
        """Streaming form of the FLE scanner: the directory is a live
        SEGMENT feed — each micro-batch decodes `.fle` files not yet
        processed, and the OFFSET is the exact sorted file-name set, so
        `readBetweenOffsets` replays any batch deterministically after a
        failure (exactly-once segment processing under checkpointing,
        arrival-order independent).  The reference has no streaming
        surface; this carries its scan framework into Structured
        Streaming the same way the ppmdir scanner does (SURVEY §2B
        streaming row)."""

        def __init__(self, options):
            self.dir = options.get("path")
            if not self.dir:
                raise ValueError("fledir requires option 'path'")

        def initialOffset(self) -> dict:
            return {"names": []}

        def _rows(self, names):
            # returns a LIST of plain-python tuples: the stream
            # framework pickles prefetched rows (numpy scalars do not
            # survive Spark's type verification)
            out = []
            for name in names:
                with open(os.path.join(self.dir, name), "rb") as fh:
                    seg = parse_segment(fh.read())
                cols = decode_segment_columns(seg)
                order = [c.name for c in seg.columns]
                kinds = {c.name: c.kind for c in seg.columns}
                for j in range(seg.n):
                    out.append(tuple(
                        (
                            None
                            if not cols[cn][1][j]
                            else str(cols[cn][0][j])
                            if kinds[cn] == _KIND_DICT
                            else int(cols[cn][0][j])
                        )
                        for cn in order
                    ))
            return out

        def _sealed(self, name: str) -> bool:
            """True iff the file parses as a complete segment.  The
            engine's writer makes torn files unobservable (temp-name +
            rename), but a FOREIGN producer writing `.fle` names in
            place can still be caught mid-write — such a file is left
            out of the batch AND the offset, so it is retried complete
            on a later micro-batch instead of poisoning the feed."""
            try:
                with open(os.path.join(self.dir, name), "rb") as fh:
                    parse_segment(fh.read())
                return True
            except Exception:
                return False

        def read(self, start: dict):
            seen = set(start.get("names", []))
            current = sorted(
                f for f in os.listdir(self.dir) if f.endswith(".fle")
            )
            fresh = [f for f in current if f not in seen and self._sealed(f)]
            # iter() over the materialized list: the framework requires
            # an ITERATOR, and a list_iterator pickles
            return iter(self._rows(fresh)), {
                "names": sorted(seen | set(fresh))
            }

        def readBetweenOffsets(self, start: dict, end: dict):
            fresh = sorted(
                set(end.get("names", [])) - set(start.get("names", []))
            )
            return iter(self._rows(fresh))

        def commit(self, end: dict) -> None:
            pass  # offsets live in the query checkpoint; nothing to prune

    FLE_STREAM_API_AVAILABLE = True
except ImportError:  # pragma: no cover
    FLE_STREAM_API_AVAILABLE = False


def _fle_simple_stream_reader(self, schema):
    if not FLE_STREAM_API_AVAILABLE:
        raise NotImplementedError("streaming DataSource requires Spark >= 4.0")
    return FleStreamReader(self.options)


FleDataSource.simpleStreamReader = _fle_simple_stream_reader


def register_fledir(spark) -> None:
    try:
        spark.dataSource.register(FleDataSource)
    except Exception:  # already registered on this session
        pass


def _fle_asset_dir(sf_dir: str, leaf: str) -> str:
    import hashlib as _h

    key = _h.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join("/tmp/spark_graft_formats", key, leaf)


def materialize_fle_dir(spark, sf_dir: str) -> str:
    """Write-once: encode lineitem (l_returnflag, NULLIF(l_quantity, 10))
    into `.fle` segments through the fledir WRITER half.  The NULLIF
    derivation stores a genuinely nullable column, so the validity words
    (the def-level analog) round-trip through real file bytes, not just
    in-plan masks.  Encoding happens inside `mapInPandas` Arrow batches
    on the executors; the writer tasks persist their segments and the
    commit seals the `_DONE` manifest."""
    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    out = _fle_asset_dir(sf_dir, "fle_assets_v2")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    _clear_segments(out)  # crashed unsealed attempt: drop its files

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


def materialize_fle_sorted_dir(spark, sf_dir: str) -> str:
    """Write-once: lineitem (l_returnflag, l_quantity) SORTED by
    quantity before segmentation, so each segment covers a narrow
    quantity range and the manifest min/max stats become selective —
    the FLE analog of the engine's sorted parquet sink
    (`write_sorted_parquet`), giving the stat-pruning path real
    planning-time file skips (tightened row-group stats,
    hdfs-parquet-table-writer.cc's sorted layout made observable)."""
    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    out = _fle_asset_dir(sf_dir, "fle_sorted_assets")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    _clear_segments(out)

    def encode(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            payload = encode_segment_columns([
                ("l_returnflag", pdf["l_returnflag"].to_numpy()),
                (
                    "l_quantity",
                    pdf["l_quantity"].to_numpy().astype(np.int64),
                ),
            ])
            yield _pd.DataFrame(
                {"seg_id": [pid * 100_000 + i], "payload": [payload]}
            )

    (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        # range-partition THEN sort within partitions: every segment
        # (one per Arrow batch per partition) covers a narrow, disjoint
        # quantity range — the layout the reference's sorted writer
        # produces, which is what makes min/max stats selective
        .repartitionByRange(8, "l_quantity")
        .sortWithinPartitions("l_quantity")
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    return out


def materialize_fle_chunked_dir(spark, sf_dir: str) -> str:
    """Write-once: lineitem (l_returnflag, l_quantity) sorted WITHIN
    partitions but NOT range-partitioned across them — every segment
    spans (nearly) the full quantity domain, so the manifest's
    file-level min/max can refute nothing, while within a segment
    values ascend and the per-chunk BSTA stats become maximally
    selective.  This is the mid-file regime the round-8 chunk-skip
    tier exists for: a boundary file the file stats must keep, whose
    interior the page-level stats skip
    (hdfs-parquet-scanner.cc:1125-1132)."""
    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    out = _fle_asset_dir(sf_dir, "fle_chunked_assets")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    _clear_segments(out)

    def encode(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            payload = encode_segment_columns([
                ("l_returnflag", pdf["l_returnflag"].to_numpy()),
                (
                    "l_quantity",
                    pdf["l_quantity"].to_numpy().astype(np.int64),
                ),
            ])
            yield _pd.DataFrame(
                {"seg_id": [pid * 100_000 + i], "payload": [payload]}
            )

    (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        # round-robin repartition (hash of nothing = arbitrary) then
        # sort within: each partition holds a full-domain sample in
        # ascending order — file stats useless, chunk stats sharp
        .repartition(8)
        .sortWithinPartitions("l_quantity")
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    return out


def materialize_fle_signed_dir(spark, sf_dir: str) -> str:
    """Write-once: lineitem (l_returnflag, l_quantity - 25 AS balance)
    — a SIGNED column crossing zero, stored through the offset kind
    (the container's own order-preserving offset; round 8).  Negative
    domains are what the reference's unsigned FLE codes cannot hold
    directly — the sorted-dictionary remap idea applied to integers."""
    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    out = _fle_asset_dir(sf_dir, "fle_signed_assets")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    _clear_segments(out)

    def encode(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            payload = encode_segment_columns([
                ("l_returnflag", pdf["l_returnflag"].to_numpy()),
                (
                    "balance",
                    pdf["balance"].to_numpy().astype(np.int64),
                ),
            ])
            yield _pd.DataFrame(
                {"seg_id": [pid * 100_000 + i], "payload": [payload]}
            )

    from pyspark.sql import functions as F

    (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            (F.col("l_quantity").cast("long") - F.lit(25)).alias("balance"),
        )
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    return out


def materialize_fle_multi_dir(spark, sf_dir: str) -> str:
    """Write-once: the GENERAL container shape — four lineitem columns
    (two order-preserving dictionary strings + one nullable int + one
    plain int) in one segment stream, matching the reference's
    one-scanner-per-slot column model (hdfs-parquet-scanner.cc:
    1410-1451) rather than the two-column demo."""
    import pandas as _pd

    from impala_avx2_parquet_scanner_spark.catalog import table
    from impala_avx2_parquet_scanner_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    register_fledir(spark)
    out = _fle_asset_dir(sf_dir, "fle_multi_assets")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    _clear_segments(out)

    def encode(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            qty = pdf["l_quantity"].astype("float64")
            payload = encode_segment_columns([
                ("l_returnflag", pdf["l_returnflag"].to_numpy()),
                ("l_linestatus", pdf["l_linestatus"].to_numpy()),
                ("l_quantity", qty.where(qty != 10.0).to_numpy()),
                (
                    "l_linenumber",
                    pdf["l_linenumber"].to_numpy().astype(np.int64),
                ),
            ])
            yield _pd.DataFrame(
                {"seg_id": [pid * 100_000 + i], "payload": [payload]}
            )

    (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_linenumber"
        )
        .mapInPandas(encode, schema="seg_id long, payload binary")
        .write.format("fledir")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    return out
