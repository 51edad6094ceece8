"""Pure-numpy image codecs — the real implementation behind the decode seam.

Rounds 1-3 stubbed ``multimodal.decode_media(fake=False)`` with a
NotImplementedError at the exact point where the reference runs
``cv2.imdecode`` (``img_decode``, paddleocr.py:529-547, and
``check_and_read``, ppocr/utils/utility.py:97-128: sniff the container,
decode to an (H, W, C) uint8 ndarray). This module is that seam's real
body for every container decodable with stdlib + numpy alone (no cv2/PIL
in this environment, by design):

* **PPM (P6) / PGM (P5)** — binary netpbm, maxval < 256;
* **BMP** — uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER, bottom-up
  or top-down, 4-byte row padding, BGR(A) channel order;
* **PNG** — non-interlaced 8-bit gray / RGB / RGBA via ``zlib``: chunk
  walk, IDAT concatenation, and all five scanline filters (None / Sub /
  Up / Average / Paeth).

Matching encoders exist for all three so the codec is testable as a
roundtrip property (arr → encode → decode == arr) plus hand-packed,
spec-derived golden bytes in tests — never the encoder checking itself
alone. The PNG encoder deliberately cycles the filter type per row
(row % 5) so every decoder filter path is exercised by ordinary data.

Scale note: decode is inherently per-blob CPU work; the Spark side calls
these inside Arrow-batched ``mapInPandas`` over content-addressed
DISTINCT refs (multimodal.media_features), so each blob decodes once
regardless of how many documents reference it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    """Unsupported container/feature or corrupt bytes."""


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------

def _pnm_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """First n whitespace-separated integer tokens after ``start``,
    honoring '#' comments; returns (values, offset past the single
    whitespace byte that terminates the last token — the netpbm rule)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i] == ord("#"):
            while i < len(buf) and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated netpbm header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1     # exactly one whitespace after maxval


def decode_pnm(buf: bytes) -> np.ndarray:
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageDecodeError(f"not binary netpbm: {magic!r}")
    channels = 3 if magic == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(buf, 3, 2)
    if maxval <= 0 or maxval > 255:
        raise ImageDecodeError(f"unsupported netpbm maxval {maxval}")
    need = w * h * channels
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, channels)


def encode_pnm(arr: np.ndarray) -> bytes:
    arr = _as_hwc(arr)
    h, w, c = arr.shape
    if c == 3:
        magic = b"P6"
    elif c == 1:
        magic = b"P5"
    else:
        raise ImageDecodeError(f"netpbm supports 1 or 3 channels, got {c}")
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed BITMAPINFOHEADER, 24/32-bit)
# ---------------------------------------------------------------------------

def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ImageDecodeError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise ImageDecodeError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ImageDecodeError(f"unsupported BMP bpp {bpp}")
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)
    if bottom_up:
        px = px[::-1]
    # BGR(A) → RGB(A)
    out = px[..., [2, 1, 0] + ([3] if nch == 4 else [])]
    return np.ascontiguousarray(out)


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = _as_hwc(arr)
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)      # BMP has no 8-bit-gray path here
    h, w, c = arr.shape
    if c not in (3, 4):
        raise ImageDecodeError(f"BMP encoder supports 3/4 channels, got {c}")
    bgr = arr[..., [2, 1, 0] + ([3] if c == 4 else [])]
    stride = (w * c + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * c] = bgr.reshape(h, w * c)
    pix = rows[::-1].tobytes()               # bottom-up
    data_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_off + len(pix), 0, 0,
                                  data_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, c * 8, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ImageDecodeError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = nch = -1
    while pos + 8 <= len(buf):
        length, ctype = struct.unpack_from(">I4s", buf, pos)
        body = buf[pos + 8:pos + 8 + length]
        pos += 12 + length                   # len + type + body + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ImageDecodeError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ImageDecodeError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ImageDecodeError("interlaced PNG unsupported")
            nch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w < 0 or not idat:
        raise ImageDecodeError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ImageDecodeError("PNG scanline size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        out[y] = _unfilter_row(int(filters[y]), lines[y], prev, nch)
        prev = out[y]
    return out.reshape(h, w, nch)


def _unfilter_row(ft: int, line: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §9): uint8 modulo-256 sums;
    Average uses the floor of the INT mean of left and up; Paeth picks
    the closest of left/up/up-left with the spec's tie order."""
    cur = line.astype(np.int16)
    up = prev.astype(np.int16)
    if ft == 0:
        return line.copy()
    if ft == 2:                               # Up — fully vectorized
        return ((cur + up) & 0xFF).astype(np.uint8)
    out = np.zeros_like(line)
    for x in range(len(line)):
        a = int(out[x - bpp]) if x >= bpp else 0           # left
        b = int(prev[x])                                   # up
        if ft == 1:                           # Sub
            v = cur[x] + a
        elif ft == 3:                         # Average
            v = cur[x] + ((a + b) >> 1)
        elif ft == 4:                         # Paeth
            c = int(prev[x - bpp]) if x >= bpp else 0      # up-left
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = cur[x] + pred
        else:
            raise ImageDecodeError(f"bad PNG filter type {ft}")
        out[x] = v & 0xFF
    return out


def _filter_row(ft: int, line: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply one PNG scanline filter (encoder side; exact inverse of
    :func:`_unfilter_row` — predictors read the RECONSTRUCTED row, which
    for the encoder is the raw input itself)."""
    cur = line.astype(np.int16)
    up = prev.astype(np.int16)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    if ft == 0:
        return line.copy()
    if ft == 1:
        return ((cur - left) & 0xFF).astype(np.uint8)
    if ft == 2:
        return ((cur - up) & 0xFF).astype(np.uint8)
    if ft == 3:
        return ((cur - ((left + up) >> 1)) & 0xFF).astype(np.uint8)
    if ft == 4:
        upleft = np.zeros_like(up)
        upleft[bpp:] = up[:-bpp]
        p = left + up - upleft
        pa, pb, pc = (np.abs(p - left), np.abs(p - up), np.abs(p - upleft))
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, upleft))
        return ((cur - pred) & 0xFF).astype(np.uint8)
    raise ImageDecodeError(f"bad PNG filter type {ft}")


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """``filter_mode='cycle'`` uses filter (y % 5) for row y so a decode
    of any image ≥5 rows exercises every filter path; ``'none'`` writes
    filter 0 throughout."""
    arr = _as_hwc(arr)
    h, w, c = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ImageDecodeError(f"PNG encoder supports 1/3/4 ch, got {c}")
    flat = arr.reshape(h, w * c)
    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_mode == "cycle" else 0
        lines.append(ft)
        lines += _filter_row(ft, flat[y], prev, c).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# dispatch — the img_decode seam
# ---------------------------------------------------------------------------

def decode_image(buf: bytes) -> np.ndarray:
    """Sniff the container by magic and decode to (H, W, C) uint8 —
    the cv2.imdecode seam (paddleocr.py:529-547) made real."""
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    raise ImageDecodeError(f"unrecognized image magic {buf[:8]!r}")


def _as_hwc(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ImageDecodeError(f"expected (H, W[, C]) array, got {arr.shape}")
    return np.ascontiguousarray(arr)


# ---------------------------------------------------------------------------
# deterministic test-corpus renderer
# ---------------------------------------------------------------------------

#: Container rotation for the rendered gate corpus (index = md5 byte 6 % 4).
RENDER_FORMATS = ("ppm", "bmp", "png", "png_gray")


def render_ref_image(ref: str) -> tuple[str, bytes]:
    """Deterministically render REAL encoded image bytes for a media ref.

    The synthetic corpus carries content-addressed refs but no blobs; this
    renders the blob a ref "addresses": dims 8..16 from md5 bytes 4/5, the
    container from byte 6, and pixel (y, x, channel c) =
    ``(md5_byte[c] + 7x + 13y) % 256`` (single-channel variant uses c=0).
    The formula is plain integer arithmetic so the DuckDB oracle can
    predict every decoded statistic WITHOUT decoding images — making the
    encode→decode path itself the thing the correctness gate checks.
    """
    import hashlib

    h = hashlib.md5(ref.encode()).digest()
    height, width = 8 + h[4] % 9, 8 + h[5] % 9
    fmt = RENDER_FORMATS[h[6] % 4]
    y = np.arange(height, dtype=np.int32)[:, None]
    x = np.arange(width, dtype=np.int32)[None, :]
    if fmt == "png_gray":
        px = ((h[0] + 7 * x + 13 * y) % 256).astype(np.uint8)[..., None]
        return fmt, encode_png(px)
    px = np.stack([((h[c] + 7 * x + 13 * y) % 256).astype(np.uint8)
                   for c in range(3)], axis=-1)
    if fmt == "ppm":
        return fmt, encode_pnm(px)
    if fmt == "bmp":
        return fmt, encode_bmp(px)
    return fmt, encode_png(px)
