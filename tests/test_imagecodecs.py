"""Image codec tests: spec-derived golden bytes (hand-packed, independent
of our encoders), encode→decode roundtrip properties, the committed
fixture blobs, and the distributed real-decode path."""

from __future__ import annotations

import glob
import hashlib
import os
import struct
import zlib

import numpy as np
import pytest

from paddleocr_spark import imagecodecs as IC

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# spec-derived golden bytes (built from the format specs with struct/zlib,
# never with our encoders — so these catch an encoder+decoder shared bug)
# ---------------------------------------------------------------------------

def test_ppm_golden_bytes():
    # P6, 2x2, with a header comment; pixels row-major RGB
    buf = b"P6\n# c\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  9, 8, 7])
    arr = IC.decode_image(buf)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [9, 8, 7]


def test_bmp_golden_bytes_bottom_up_with_padding():
    # 24-bit 2x2 BMP: stride = 8 (2 px * 3 B padded to 4-byte multiple),
    # rows stored bottom-up, channels BGR
    w = h = 2
    stride = 8
    # want top row [(255,0,0), (0,255,0)], bottom row [(0,0,255), (9,8,7)]
    bottom = bytes([255, 0, 0,  7, 8, 9]) + b"\0\0"   # BGR of bottom row
    top = bytes([0, 0, 255,  0, 255, 0]) + b"\0\0"
    pix = bottom + top                                 # bottom-up order
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                         0, 0, 0, 0))
    arr = IC.decode_image(hdr + pix)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [9, 8, 7]


def test_bmp_golden_top_down_32bit():
    # negative height = top-down; 32-bit BGRA, no padding needed
    pix = bytes([1, 2, 3, 4,  5, 6, 7, 8])            # one row, 2 px
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(pix),
                         0, 0, 0, 0))
    arr = IC.decode_image(hdr + pix)
    assert arr.shape == (1, 2, 4)
    assert arr[0, 0].tolist() == [3, 2, 1, 4]          # BGRA → RGBA
    assert arr[0, 1].tolist() == [7, 6, 5, 8]


def _png_chunks(ihdr_body: bytes, raw_scanlines: bytes) -> bytes:
    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
            + chunk(b"IDAT", zlib.compress(raw_scanlines))
            + chunk(b"IEND", b""))


def test_png_golden_all_five_filters():
    """5-row 2-px-wide grayscale PNG, one row per filter type, with the
    reconstruction worked out BY HAND from the PNG spec (§9):

    row0 None   : raw (10, 20)              → (10, 20)
    row1 Sub    : raw (5, 250)              → (5+0, 250+5)   = (5, 255)
    row2 Up     : raw (7, 9)                → (5+7, 255+9)   = (12, 8)
    row3 Average: raw (4, 200)  a=(0,10)φ.. → (4+(0+12)/2, 200+(10+8)/2)
                                             = (10, 209)
    row4 Paeth  : raw (1, 2)    preds: x0: a=0 b=10 c=0 → p=10 →pb=0 → b
                                x1: a=11 b=209 c=10 → p=210, pa=199,
                                    pb=1, pc=200 → b=209 → (1+10, 2+209)
                                             = (11, 211)
    """
    ihdr = struct.pack(">IIBBBBB", 2, 5, 8, 0, 0, 0, 0)
    scan = bytes([0, 10, 20,
                  1, 5, 250,
                  2, 7, 9,
                  3, 4, 200,
                  4, 1, 2])
    arr = IC.decode_image(_png_chunks(ihdr, scan))
    assert arr.shape == (5, 2, 1)
    assert arr[:, :, 0].tolist() == [[10, 20], [5, 255], [12, 8],
                                     [10, 209], [11, 211]]


def test_png_golden_rgb_sub_filter_uses_bpp_offset():
    # Sub's "left" neighbor is bpp bytes back (3 for RGB) — row:
    # px0 raw (1,2,3); px1 filt (10,20,30) → px1 = (11, 22, 33)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scan = bytes([1, 1, 2, 3, 10, 20, 30])
    arr = IC.decode_image(_png_chunks(ihdr, scan))
    assert arr[0, 0].tolist() == [1, 2, 3]
    assert arr[0, 1].tolist() == [11, 22, 33]


def test_unsupported_containers_raise():
    with pytest.raises(IC.ImageDecodeError):
        IC.decode_image(b"GIF89a notsupported")
    with pytest.raises(IC.ImageDecodeError):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # interlaced
        IC.decode_image(_png_chunks(ihdr, bytes([0, 1])))
    with pytest.raises(IC.ImageDecodeError):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)  # 16-bit
        IC.decode_image(_png_chunks(ihdr, bytes([0, 1, 1])))


# ---------------------------------------------------------------------------
# roundtrip properties
# ---------------------------------------------------------------------------

def test_roundtrip_all_formats_and_shapes():
    rng = np.random.default_rng(7)
    for _ in range(60):
        h, w = int(rng.integers(1, 18)), int(rng.integers(1, 18))
        c = int(rng.choice([1, 3, 4]))
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        for fm in ("cycle", "none"):
            assert np.array_equal(
                IC.decode_png(IC.encode_png(arr, filter_mode=fm)), arr)
        if c in (3, 4):
            assert np.array_equal(IC.decode_bmp(IC.encode_bmp(arr)), arr)
        if c in (1, 3):
            assert np.array_equal(IC.decode_pnm(IC.encode_pnm(arr)), arr)


# ---------------------------------------------------------------------------
# committed fixture blobs + renderer stability
# ---------------------------------------------------------------------------

FIXTURE_REFS = {"img://h/0000": "png_gray", "img://h/0001": "png",
                "img://h/0002": "bmp", "img://h/0005": "ppm"}


def _formula_pixels(ref: str) -> np.ndarray:
    h = hashlib.md5(ref.encode()).digest()
    H, W = 8 + h[4] % 9, 8 + h[5] % 9
    fmt = IC.RENDER_FORMATS[h[6] % 4]
    y = np.arange(H)[:, None]
    x = np.arange(W)[None, :]
    if fmt == "png_gray":
        return ((h[0] + 7 * x + 13 * y) % 256).astype(np.uint8)[..., None]
    return np.stack([((h[c] + 7 * x + 13 * y) % 256).astype(np.uint8)
                     for c in range(3)], axis=-1)


def test_committed_fixture_blobs_decode_to_formula_pixels():
    """The blobs under fixtures/media/ are COMMITTED bytes; decoding them
    must reproduce the closed-form pixel pattern exactly (pins both the
    decoder and the byte-stability of the render format)."""
    for ref, fmt in FIXTURE_REFS.items():
        name = hashlib.md5(ref.encode()).hexdigest()[:8]
        ext = "png" if fmt.startswith("png") else fmt
        path = os.path.join(REPO, "fixtures", "media", f"{fmt}_{name}.{ext}")
        arr = IC.decode_image(open(path, "rb").read())
        assert np.array_equal(arr, _formula_pixels(ref)), (ref, fmt)
    assert len(glob.glob(os.path.join(REPO, "fixtures", "media", "*"))) == 4


def test_render_matches_committed_bytes():
    for ref, fmt in FIXTURE_REFS.items():
        got_fmt, buf = IC.render_ref_image(ref)
        name = hashlib.md5(ref.encode()).hexdigest()[:8]
        ext = "png" if fmt.startswith("png") else fmt
        path = os.path.join(REPO, "fixtures", "media", f"{fmt}_{name}.{ext}")
        assert got_fmt == fmt
        assert buf == open(path, "rb").read(), ref


# ---------------------------------------------------------------------------
# distributed real-decode path (decode_media fake=False)
# ---------------------------------------------------------------------------

def test_decode_media_real_distributed(spark):
    from paddleocr_spark.multimodal import decode_media, pixel_stats

    refs = [f"img://h/{i:04x}" for i in range(12)]
    rows = []
    for r in refs:
        _, buf = IC.render_ref_image(r)
        rows.append((r, bytearray(buf)))
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["media_ref"]: r for r in decode_media(df, fake=False).collect()}
    assert set(got) == set(refs)
    for r in refs:
        arr = IC.decode_image(bytes(dict(rows)[r]))
        s = pixel_stats(arr)
        row = got[r]
        assert row["width"] == s["width"] and row["height"] == s["height"]
        assert row["n_frames"] == 1
        feat = row["feature"]
        assert len(feat) == 8
        # feature is float32; stats are exact small integers/ratios
        assert feat[0] == pytest.approx(s["mean_r"], abs=1e-3)
        assert feat[5] == s["max_gray"]
        assert feat[7] == arr.shape[2]
