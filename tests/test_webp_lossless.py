"""WebP lossless (VP8L) codec pins — r13, the seventh real image
decoder. Every feature of the decoder is exercised against the
independent forward encoder (lossless → byte-exact), plus corrupt
rejection, the decode-bomb guard, and the Spark operator surface."""

import random

import numpy as np
import pytest

from llm_training_data_pipeline_spark.operators import webp_lossless as wl


def _check(img, **kw):
    p = wl._vp8l_build(img, **kw)
    got = wl._vp8l_decode(p)
    assert got is not None, kw
    h, w, _ = img.shape
    assert got[:2] == (w, h)
    arr = np.frombuffer(got[2], np.uint8).reshape(h, w, 3)
    assert np.array_equal(arr, img), kw
    return p


def test_vp8l_core_paths_round_trip():
    """Literals with complex canonical codes, simple 1-2-symbol codes
    (constant channels), LZ77 runs (dist 1 and dist xsize through the
    2D map + plain encoding), color cache, and the no-LZ77 path."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (13, 17, 3), np.uint8)
    _check(img)
    _check(img, cache_bits=6)
    _check(img, use_lz77=False)
    run = np.zeros((16, 20, 3), np.uint8)
    run[4:9] = (10, 200, 30)
    run[:, 5] = (1, 2, 3)
    _check(run)
    _check(run, cache_bits=4)
    _check(np.full((9, 31, 3), 77, np.uint8))  # constant image
    for shape in ((1, 1, 3), (1, 9, 3), (7, 1, 3), (2, 3, 3)):
        _check(rng.randint(0, 256, shape, np.uint8))


def test_vp8l_transforms_round_trip():
    """All four transforms: subtract-green; predictor (all 14 modes at
    two block sizes, incl. the libwebp last-column TR wrap); color
    (signed 3.5 fixed-point deltas, r2b on the recovered red); palette
    at every pixel-bundling width (2/4/16/17/100 colors); and stacked
    combinations."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (13, 17, 3), np.uint8)
    grad = (
        np.add.outer(np.arange(14) * 9, np.arange(18) * 5)[..., None]
        .repeat(3, 2) % 256
    ).astype(np.uint8)
    _check(img, subtract_green=True)
    for mode in range(14):
        _check(grad, predictor_mode=mode, predictor_bits=2)
        _check(img, predictor_mode=mode, predictor_bits=3)
    _check(img, color_element=(23, 250, 7))
    _check(grad, color_element=(130, 64, 200), color_bits=2)
    for ncol in (2, 3, 4, 9, 16, 17, 100):
        vals = rng.randint(0, 256, (ncol, 3), np.uint8)
        _check(vals[rng.randint(0, ncol, (11, 23))], palette=True)
    _check(img, subtract_green=True, predictor_mode=11, cache_bits=5)
    _check(img, color_element=(23, 9, 77), subtract_green=True)


def test_vp8l_meta_prefix_groups():
    """Meta prefix codes: the group index rides the entropy image's
    (red<<8)|green channel per tile; 2- and 3-group splits decode."""
    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, (20, 33, 3), np.uint8)
    _check(big, meta_bits=2, ngroups=2)
    _check(big, meta_bits=3, ngroups=3, cache_bits=4)


def test_vp8l_rejects_corrupt_and_bombs():
    """Honest None: bad magic, lossy VP8 chunk, truncation, version
    bits, incomplete prefix trees (kraft check), and the decode-bomb
    guard — a 20-byte header claiming 16383x16383 must reject BEFORE
    allocating the pixel store."""
    import struct

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (13, 17, 3), np.uint8)
    good = wl._vp8l_build(img)
    assert wl._vp8l_decode(good) is not None
    assert wl._vp8l_decode(b"not webp") is None
    assert wl._vp8l_decode(good[:-10]) is None
    lossy = good.replace(b"VP8L", b"VP8 ", 1)
    assert wl._vp8l_decode(lossy) is None
    # version bits != 0
    bad = bytearray(good)
    at = bad.index(b"VP8L") + 8
    bad[at + 4] ^= 0x80  # top bit of the 5th bitstream byte ~ version区
    # (whatever field it lands in, decode must not raise)
    wl._vp8l_decode(bytes(bad))
    # bomb
    w = wl._Vp8lBitWriter()
    w.put(0x2F, 8)
    w.put(16382, 14)
    w.put(16382, 14)
    w.put(0, 1)
    w.put(0, 3)
    data = w.done()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    body = b"WEBP" + chunk
    assert wl._vp8l_decode(b"RIFF" + struct.pack("<I", len(body)) + body) is None
    # fuzz slice: never raises
    valids = [
        good,
        wl._vp8l_build(img, subtract_green=True, cache_bits=5,
                       predictor_mode=11),
        wl._vp8l_build(img, meta_bits=2, ngroups=2),
    ]
    rng2 = random.Random(5)
    for _ in range(4000):
        b = bytearray(valids[rng2.randrange(len(valids))])
        mode = rng2.random()
        if mode < 0.4:
            for _ in range(rng2.randrange(1, 6)):
                b[rng2.randrange(len(b))] ^= 1 << rng2.randrange(8)
        elif mode < 0.7:
            b = b[: rng2.randrange(len(b))]
        else:
            at = rng2.randrange(len(b))
            b[at:at] = bytes(
                rng2.randrange(256) for _ in range(rng2.randrange(1, 9))
            )
        wl._vp8l_decode(bytes(b))  # must not raise


def test_vp8l_spark_operator(spark):
    """decode_webp_pixels through the shared PIXEL_SCHEMA plumbing and
    the sniffing decode_image_pixels dispatch over the webp fixture."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        decode_webp_pixels,
        image_pixel_stats,
        synthetic_webp_assets,
    )

    assets = synthetic_webp_assets(spark, n=12)
    px = {r["asset_id"]: r for r in decode_webp_pixels(assets).collect()}
    assert len(px) == 12
    for i, r in px.items():
        arr = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(
            r["height"], r["width"], 3
        )
        from llm_training_data_pipeline_spark.operators.multimodal import (
            _cross_format_base_pixels,
        )

        assert np.array_equal(arr, _cross_format_base_pixels(i % 6))
        assert r["is_stub"] is False
    # the sniffer dispatches RIFF/WEBP payloads too
    sniffed = decode_image_pixels(assets).collect()
    assert len(sniffed) == 12
    stats = image_pixel_stats(decode_webp_pixels(assets)).collect()
    assert len(stats) == 12
