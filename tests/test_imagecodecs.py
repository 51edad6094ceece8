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


# ---------------------------------------------------------------------------
# GIF (LZW, multi-frame) — spec-derived golden first, then properties
# ---------------------------------------------------------------------------

def _pack_codes_lsb(codes):
    """(value, width) list → LSB-first packed bytes, per GIF89a §22/
    Appendix F — written here from the spec, independent of the encoder."""
    acc = nbits = 0
    out = bytearray()
    for value, width in codes:
        acc |= value << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_golden_hand_lzw():
    # 3x2 indices [1,1,0,0,2,2], min code size 2 (clear=4, eoi=5).
    # Hand-traced LZW: CLEAR, 1, 1, 0 @ width 3 (table hits 8 entries
    # as [0,0] registers -> widen), then 0, 2, 2, EOI @ width 4.
    codes = [(4, 3), (1, 3), (1, 3), (0, 3), (0, 4), (2, 4), (2, 4), (5, 4)]
    data = _pack_codes_lsb(codes)
    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    buf = (b"GIF89a" + struct.pack("<HH", 3, 2)
           + bytes([0xF1, 0, 0]) + palette            # GCT: 4 entries
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 2) + b"\x00"
           + bytes([2]) + bytes([len(data)]) + data + b"\x00"
           + b"\x3b")
    frames = IC.decode_gif(buf)
    assert len(frames) == 1
    exp_idx = np.array([[1, 1, 0], [0, 2, 2]], dtype=np.uint8)
    pal = np.frombuffer(palette, np.uint8).reshape(4, 3)
    assert (frames[0] == pal[exp_idx]).all()
    # decode_image takes frame 0 (check_and_read's GIF branch)
    assert (IC.decode_image(buf) == frames[0]).all()


def test_gif_interlaced_rows_restored():
    # h=5: interlace arrival order is rows [0, 4, 2, 1, 3]
    img = (np.arange(5 * 4, dtype=np.uint8) % 251).reshape(5, 4)
    arrival = img[[0, 4, 2, 1, 3]]
    data = IC._lzw_encode(arrival.tobytes(), 8)
    buf = (b"GIF89a" + struct.pack("<HH", 4, 5)
           + bytes([0xF7, 0, 0]) + bytes(v for i in range(256)
                                         for v in (i, i, i))
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 5)
           + bytes([0x40])                            # interlace flag
           + bytes([8]) + IC._gif_subblocks(data)[0:]
           + b"\x3b")
    frames = IC.decode_gif(buf)
    assert (frames[0][:, :, 0] == img).all()


def test_gif_transparency_composites_over_previous_frame():
    # frame 1 full; frame 2 declares index 7 transparent and covers the
    # whole canvas with it except one pixel -> composited frame keeps
    # frame 1 everywhere else
    f1 = np.full((3, 3), 50, dtype=np.uint8)
    f2 = np.full((3, 3), 7, dtype=np.uint8)
    f2[1, 1] = 200
    gct = bytes(v for i in range(256) for v in (i, i, i))
    def img_block(arr, gce):
        return (gce + b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 3)
                + b"\x00" + bytes([8])
                + IC._gif_subblocks(IC._lzw_encode(arr.tobytes(), 8)))
    buf = (b"GIF89a" + struct.pack("<HH", 3, 3) + bytes([0xF7, 0, 0])
           + gct
           + img_block(f1, b"\x21\xf9\x04\x04\x00\x00\x00\x00")
           + img_block(f2, b"\x21\xf9\x04\x05\x00\x00\x07\x00")  # tflag
           + b"\x3b")
    frames = IC.decode_gif(buf)
    assert len(frames) == 2
    exp = f1.copy()
    exp[1, 1] = 200
    assert (frames[1][:, :, 0] == exp).all()


def test_gif_multiframe_roundtrip_and_lzw_table_growth():
    rng = np.random.RandomState(11)
    # enough pixels that the LZW table crosses several width boundaries
    frames = [rng.randint(0, 256, (40, 40), dtype=np.uint8)
              for _ in range(3)]
    dec = IC.decode_gif(IC.encode_gif(frames))
    assert len(dec) == 3
    for f, d in zip(frames, dec):
        assert d.shape == (40, 40, 3)
        assert (d[:, :, 0] == f).all() and (d[:, :, 2] == f).all()
    # low-entropy input drives deep LZW chains + a table reset past 4096
    flat = np.zeros((90, 90), dtype=np.uint8)
    flat[::7] = 3
    dec2 = IC.decode_gif(IC.encode_gif([flat]))
    assert (dec2[0][:, :, 0] == flat).all()


def test_render_ref_gif_formula_and_frame_count():
    import hashlib
    for i in range(24):
        ref = f"img://h/g{i:03x}"
        h = hashlib.md5(ref.encode()).digest()
        frames = IC.decode_frames(IC.render_ref_gif(ref))
        assert len(frames) == 1 + h[3] % 4
        hh, ww = 8 + h[4] % 9, 8 + h[5] % 9
        y = np.arange(hh)[:, None]
        x = np.arange(ww)[None, :]
        for k, fr in enumerate(frames):
            assert fr.shape == (hh, ww, 3)
            exp = (h[0] + 7 * x + 13 * y + 17 * k) % 256
            assert (fr[:, :, 0] == exp).all()


def test_decode_media_real_gif_frame_count(spark):
    from paddleocr_spark.multimodal import decode_media

    rows = [(f"img://h/g{i}", bytearray(IC.render_ref_gif(f"img://h/g{i}")))
            for i in range(6)]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["media_ref"]: r for r in decode_media(df, fake=False).collect()}
    for ref, buf in rows:
        assert got[ref]["n_frames"] == len(IC.decode_frames(bytes(buf)))
