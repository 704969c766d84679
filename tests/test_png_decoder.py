"""Stdlib PNG codec + multimodal-seam integration (r6: the 'no real
media decoder' gap).  The filter tests apply the FORWARD scanline
filters independently in this file, so decode is checked against the
spec's math, not against this repo's own encoder."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from chearch_spark.sources.decoders.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    png_decoder,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize(
    "shape",
    [(1, 1, 1), (5, 7, 1), (4, 4, 2), (8, 3, 3), (6, 6, 4), (1, 16, 3)],
)
def test_roundtrip(shape):
    img = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == shape
    assert (out == img).all()


def test_2d_gray_input_roundtrips_as_1_channel():
    img = _rng(1).integers(0, 256, size=(4, 5), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (4, 5, 1)
    assert (out[:, :, 0] == img).all()


# --- independent forward filters (spec math, not the repo encoder) -----


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Apply PNG filter `ftype` to every scanline of (h, w, c) uint8,
    returning the raw pre-compression stream (filter byte + filtered
    scanline per row) — the inverse of what decode must do."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        a = np.concatenate([np.zeros(c, dtype=np.int64), cur[:-c]])
        b = prev
        cc = np.concatenate([np.zeros(c, dtype=np.int64), prev[:-c]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - a
        elif ftype == 2:
            filt = cur - b
        elif ftype == 3:
            filt = cur - (a + b) // 2
        elif ftype == 4:
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc)
            )
            filt = cur - pred
        out.append(ftype)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(_forward_filter(img, ftype))
    return (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_all_scanline_filters_decode(ftype, channels):
    img = _rng(ftype * 10 + channels).integers(
        0, 256, size=(7, 5, channels), dtype=np.uint8
    )
    assert (decode_png(_png_with_filter(img, ftype)) == img).all()


def test_palette_decode():
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(2))
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data) == pal[idx]).all()


def test_rejections():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)
    # corrupted CRC
    broken = bytearray(good)
    broken[-5] ^= 0xFF  # inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(broken))
    # truncated scanline stream
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad = (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="wrong length"):
        decode_png(bad)


def test_seam_adapter_support_matrix():
    img = _rng(3).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    data = encode_png(img)
    assert (png_decoder(data, "image") == img.ravel()).all()
    with pytest.raises(NotImplementedError, match="kind"):
        png_decoder(data, "audio")
    with pytest.raises(NotImplementedError, match="not a PNG"):
        png_decoder(b"not png bytes", "image")


def test_extract_features_through_png_decoder(spark):
    """End-to-end: real PNGs ride the binary column, the seam decodes
    them inside the Arrow kernel, and the byte statistics equal the
    numpy ground truth over the PIXELS (not the compressed bytes) —
    the stub and the real decoder share the whole reduction plan."""
    from chearch_spark.sources import multimodal as M

    imgs = {
        i: _rng(i).integers(0, 256, size=(4 + i, 5, 3), dtype=np.uint8)
        for i in range(4)
    }
    rows = [(i, "image", bytearray(encode_png(im))) for i, im in imgs.items()]
    media = spark.createDataFrame(
        rows, "doc_id long, kind string, payload binary"
    )
    got = {
        r.doc_id: r
        for r in M.extract_features(media, decoder=png_decoder).collect()
    }
    for i, im in imgs.items():
        flat = im.ravel().astype(np.int64)
        assert got[i].n_bytes == flat.size
        assert got[i].byte_sum == int(flat.sum())
        assert got[i].byte_min == int(flat.min())
        assert got[i].byte_max == int(flat.max())


def test_resize_images_nearest_neighbor(spark):
    from chearch_spark.sources import multimodal as M

    base = np.array(
        [[[10, 0, 0], [0, 20, 0]], [[0, 0, 30], [40, 40, 40]]],
        dtype=np.uint8,
    )
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_png(base)))],
        "doc_id long, kind string, payload binary",
    )
    rows = M.resize_images(media, 4, 4).collect()
    assert len(rows) == 1 and rows[0].width == 4 and rows[0].height == 4
    out = decode_png(bytes(rows[0].png))
    # 2x2 -> 4x4 nearest neighbor: each source pixel becomes a 2x2 block
    want = base.repeat(2, axis=0).repeat(2, axis=1)
    assert (out == want).all()
    # downscale back: picks the block corners -> the original image
    back = M.resize_images(
        spark.createDataFrame(
            [(7, "image", bytearray(rows[0].png))],
            "doc_id long, kind string, payload binary",
        ),
        2,
        2,
    ).collect()
    assert (decode_png(bytes(back[0].png)) == base).all()
    with pytest.raises(ValueError, match="positive"):
        M.resize_images(media, 0, 4)
