"""GIF87a/89a codec in pure stdlib + numpy — no external image libs.

Continues the round-4 "real compressed-media codecs" series (PNG via
stdlib zlib, baseline JPEG): a spec-conformant GIF implementation whose
decoder opens files produced by standard tools (CPython's own test GIFs
and a real-world 640x421 animation — see tests/test_pipeline.py), not a
stub.

Scope (honest):
* DECODER — full variable-width LZW with deferred-clear handling,
  global and local color tables, interlaced rasters, multi-image
  animations with Graphic Control Extension compositing (disposal
  none/keep (0/1), restore-to-background (2), restore-to-previous (3))
  and transparency.  Returns RGB frames; alpha is composited against
  the background color.
* ENCODER — single-frame GIF89a, non-interlaced, global color table
  built from the image's unique colors (> 256 unique colors raises —
  palette quantization is a modeling choice the caller owns, exactly
  like JPEG quality).  The encoder round-trips losslessly through the
  decoder, pinned in tests.

The LZW inner loops are per-code Python over a constant-time
accumulator bit reader (GIF code streams are LSB-first), ~5 Mpx/s —
decode cost is per-payload on executors inside an Arrow batch, never in
a shuffle; a throughput-bound deployment swaps a giflib-backed decoder
into `_DECODERS` without touching any plan shape.

Reference parity note: the reference engine has no media codecs at all
(it stops at opaque binary columns) — this module serves the north-star
multimodal pipeline surface (SURVEY §2B), with the same plan-shape
contract as the PPM/PNG/JPEG/WAV codecs in `pipeline.multimodal`.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_VERSIONS = (b"GIF87a", b"GIF89a")

#: Row-emission order of the four interlace passes (GIF89a spec §20):
#: pass 1 starts at row 0 step 8, pass 2 row 4 step 8, pass 3 row 2
#: step 4, pass 4 row 1 step 2.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12  # LZW table caps at 4096 entries


class _BitReader:
    """LSB-first variable-width code reader with an int accumulator —
    O(1) per code regardless of stream length."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor) → uint8 index raster.

    Width starts at min_code+1 and grows when the table reaches
    1 << width (cap 12 bits / 4096 entries, then codes keep flowing at
    12 bits until a clear — the "deferred clear" real encoders emit)."""
    clear = 1 << min_code
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    reader = _BitReader(data)
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None:
            break  # truncated stream: return what decoded (caller checks)
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the classic KwKwK case
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW: raster underrun")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW encode.  The width schedule mirrors the decoder's
    table growth exactly (the decoder adds one entry per code *after the
    first*, so the encoder simulates that counter rather than its own
    next_code — the classic off-by-one that garbles naive encoders)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    width = min_code + 1
    next_code = eoi + 1
    decoder_size = eoi + 1  # the decoder's table length, simulated
    first = True
    emit(clear, width)
    it = iter(indices.tolist())
    cur = next(it)
    for k in it:
        hit = table.get((cur, k))
        if hit is not None:
            cur = hit
            continue
        emit(cur, width)
        if first:
            first = False
        else:
            decoder_size += 1
            if decoder_size == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[(cur, k)] = next_code
            next_code += 1
        else:
            # table full: reset both sides with an explicit clear
            emit(clear, width)
            table.clear()
            width = min_code + 1
            next_code = eoi + 1
            decoder_size = eoi + 1
            first = True
        cur = k
    emit(cur, width)
    if not first:
        decoder_size += 1
        if decoder_size == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.array(order, dtype=np.int64)] = rows
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(payload[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[np.ndarray, list[int]]:
    """Full GIF decode → ((n, h, w, 3) uint8 composited frames,
    per-frame delays in ms).  Each returned frame is the full logical
    screen after compositing (what a viewer displays), honoring GCE
    disposal methods and transparency."""
    if payload[:6] not in _GIF_VERSIONS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic control state (applies to the next image only)
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control Extension
                flags, delay_cs = body[0], struct.unpack("<H", body[1:3])[0]
                disposal = (flags >> 2) & 0x7
                transparent = body[3] if flags & 1 else None
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: image has no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        region = canvas[top : top + ih, left : left + iw]
        if disposal == 3:
            saved = region.copy()
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background
            region[...] = bg_rgb
        elif disposal == 3:  # restore to previous
            region[...] = saved
        transparent, disposal, delay_ms = None, 0, 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame → (h, w, 3) uint8 (the still-image view)."""
    frames, _ = decode_gif_frames(payload, max_frames=1)
    return frames[0]


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → single-frame GIF89a.  The palette is the
    image's unique colors; > 256 raises (quantize upstream, the same way
    JPEG callers own the quality knob).  Lossless: decode_gif(encode_gif(x))
    == x, pinned in tests."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w = pixels.shape[:2]
    px = np.ascontiguousarray(pixels.astype(np.uint8))
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF encoder: {len(palette)} unique colors > 256; quantize first"
        )
    # color-table size must be a power of two >= 2; LZW min code >= 2
    depth = max(int(np.ceil(np.log2(max(len(palette), 2)))), 1)
    table_n = 1 << depth
    ct = np.zeros((table_n, 3), np.uint8)
    ct[: len(palette)] = palette
    min_code = max(depth, 2)
    lzw = _lzw_encode(inverse.astype(np.int64), min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def probe_gif(payload: bytes) -> dict | None:
    """Header/block-walk metadata WITHOUT LZW decode: dims, frame count,
    animation flag, total duration.  Sub-blocks are skipped by length, so
    the cost is proportional to the block count, not the pixel data."""
    if payload[:6] not in _GIF_VERSIONS:
        return None
    try:
        w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        if packed & 0x80:
            pos += 3 * (2 << (packed & 0x07))
        n_frames = 0
        duration_ms = 0
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:
                break
            if block == 0x21:
                label = payload[pos]
                pos += 1
                start = pos
                body, pos = _read_subblocks(payload, start)
                if label == 0xF9 and len(body) >= 3:
                    duration_ms += struct.unpack("<H", body[1:3])[0] * 10
                continue
            if block != 0x2C:
                return None
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            _, pos = _read_subblocks(payload, pos)
            n_frames += 1
        return {
            "format": "gif",
            "width": w,
            "height": h,
            "n_frames": n_frames,
            "animated": n_frames > 1,
            "duration_ms": duration_ms,
        }
    except (struct.error, IndexError, ValueError):
        return None
