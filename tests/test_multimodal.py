"""Multimodal plumbing tests: binary columns, header parsing, batch shapes."""

from __future__ import annotations

import pytest

from llm_training_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    extract_features,
    resize_image,
    sample_frames,
    synthetic_assets,
)


def test_decode_image_meta(spark):
    assets = synthetic_assets(spark, n=20)
    rows = {r["asset_id"]: r for r in decode_image_meta(assets).collect()}
    assert len(rows) == 20
    for i, r in rows.items():
        assert r["format"] == ("png", "gif", "tiff")[i % 3]
        assert r["width"] == 16 + (i % 8)
        assert r["height"] == 16 + (i % 5)
        assert r["n_bytes"] > 0


def test_extract_features_deterministic(spark):
    assets = synthetic_assets(spark, n=10)
    a = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    b = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)


def test_stubs_raise(spark):
    assets = synthetic_assets(spark, n=2)
    with pytest.raises(NotImplementedError):
        resize_image(assets, 8, 8)
    with pytest.raises(NotImplementedError):
        sample_frames(assets)


def test_wav_meta_parses_real_riff_header(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        synthetic_audio_assets,
    )

    out = {r["asset_id"]: r for r in decode_audio_meta(synthetic_audio_assets(spark, 8)).collect()}
    assert len(out) == 8
    r0 = out[0]  # rate 8000, 1 channel, 16-bit, 0.1 s
    assert (r0["sample_rate"], r0["channels"], r0["bits_per_sample"]) == (8000, 1, 16)
    assert abs(r0["duration_s"] - 0.1) < 1e-6
    r2 = out[2]  # rate 44100, 1 channel, 0.3 s
    assert r2["sample_rate"] == 44100
    assert abs(r2["duration_s"] - 0.3) < 2e-2  # byte_rate//10 truncation


def test_wav_meta_rejects_non_wav(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        synthetic_assets,
    )

    out = decode_audio_meta(synthetic_assets(spark, 4)).collect()
    assert all(r["sample_rate"] is None for r in out)
    assert all(r["n_bytes"] > 0 for r in out)


def test_extract_features_is_byte_histogram(spark):
    """Features are the normalized 16-bin high-nibble byte histogram —
    verified against a driver-side recomputation on a known payload."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    payload = bytes(range(256)) * 3 + b"\x00" * 16
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "asset_id long, modality string, payload binary",
    )
    got = extract_features(df).collect()[0]["features"]
    arr = np.frombuffer(payload, dtype=np.uint8)
    want = (
        (np.bincount(arr >> 4, minlength=FEATURE_DIM) / np.float64(arr.size))
        .astype(np.float32)
        .tolist()
    )
    assert got == want
    assert abs(sum(got) - 1.0) < 1e-6


def test_extract_features_empty_payload(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(b""))],
        "asset_id long, modality string, payload binary",
    )
    assert extract_features(df).collect()[0]["features"] == [0.0] * FEATURE_DIM


def test_video_meta_parses_both_mvhd_versions(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_video_meta,
        synthetic_video_assets,
    )

    rows = {
        r["asset_id"]: r
        for r in decode_video_meta(synthetic_video_assets(spark, 12)).collect()
    }
    assert len(rows) == 12
    for i, r in rows.items():
        ts = (600, 1000, 90000)[i % 3]
        assert r["brand"] == "isom"
        assert r["timescale"] == ts
        assert abs(r["duration_s"] - (1 + i % 5)) < 1e-6, (i, r)
        assert r["n_tracks"] == 1 + (i % 3)


def test_video_meta_non_mp4_yields_nulls(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_video_meta,
    )
    from llm_training_data_pipeline_spark.schemas import MULTIMODAL_SCHEMA

    df = spark.createDataFrame(
        [
            (1, "video", b"not a video at all", "video/mp4", {}),
            (2, "video", None, "video/mp4", {}),
        ],
        MULTIMODAL_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in decode_video_meta(df).collect()}
    assert rows[1]["brand"] is None and rows[1]["n_bytes"] == 18
    assert rows[2]["brand"] is None and rows[2]["n_bytes"] == 0


def test_mp4_box_walk_handles_truncation_and_largesize():
    """Malformed/truncated boxes must stop the walk, not crash; 64-bit
    largesize boxes parse."""
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import _mp4_meta

    ftyp = struct.pack(">I", 20) + b"ftypisom\x00\x00\x02\x00mp41"
    # truncated moov (declared larger than the buffer)
    bad = ftyp + struct.pack(">I", 9999) + b"moov"
    meta = _mp4_meta(bad)
    assert meta == ("isom", 0, 0.0, 0)
    # largesize moov containing a v0 mvhd
    mvhd = struct.pack(">I", 28) + b"mvhd" + b"\x00\x00\x00\x00" + struct.pack(
        ">IIII", 0, 0, 600, 1200
    )
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    meta = _mp4_meta(ftyp + moov)
    assert meta == ("isom", 600, 2.0, 0)


def test_bmp_and_webp_dims():
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _bmp_dims,
        _webp_dims,
    )

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 4
    assert _bmp_dims(bmp) == (640, 480)

    def riff(chunk: bytes, body: bytes) -> bytes:
        payload = b"WEBP" + chunk + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", len(payload)) + payload

    vp8x = riff(b"VP8X", b"\x00" * 4
                + (99).to_bytes(3, "little") + (49).to_bytes(3, "little"))
    assert _webp_dims(vp8x) == (100, 50)

    vp8 = riff(b"VP8 ", b"\x00" * 3 + b"\x9d\x01\x2a"
               + struct.pack("<HH", 320, 240) + b"\x00" * 4)
    assert _webp_dims(vp8) == (320, 240)

    bits = (199) | (99 << 14)  # w-1=199, h-1=99
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4)
    assert _webp_dims(vp8l) == (200, 100)

    assert _webp_dims(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 20) is None
    assert _bmp_dims(b"PK\x03\x04" + b"\x00" * 30) is None


def test_flac_streaminfo_meta():
    from llm_training_data_pipeline_spark.operators.multimodal import _flac_meta

    def make_flac(rate, channels, bps, total):
        packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
        si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
        return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si

    assert _flac_meta(make_flac(44100, 2, 16, 441000)) == (44100, 2, 16, 10.0)
    assert _flac_meta(make_flac(48000, 1, 24, 24000)) == (48000, 1, 24, 0.5)
    assert _flac_meta(b"fLaC" + b"\x00" * 10) is None  # truncated
    assert _flac_meta(b"RIFF....WAVE" + b"\x00" * 40) is None
    # first block not STREAMINFO → refuse
    bad = b"fLaC" + bytes([0x84]) + (34).to_bytes(3, "big") + b"\x00" * 34
    assert _flac_meta(bad) is None


def test_decode_audio_meta_handles_flac(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
    )
    from llm_training_data_pipeline_spark.schemas import MULTIMODAL_SCHEMA

    packed = (22050 << 44) | (0 << 41) | (15 << 36) | 22050
    si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    flac = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    df = spark.createDataFrame(
        [(1, "audio", flac, "audio/flac", {})], MULTIMODAL_SCHEMA
    )
    r = decode_audio_meta(df).collect()[0]
    assert (r["sample_rate"], r["channels"], r["bits_per_sample"]) == (22050, 1, 16)
    assert abs(r["duration_s"] - 1.0) < 1e-6


def test_mp3_meta_parses_frame_header():
    from llm_training_data_pipeline_spark.operators.multimodal import _mp3_meta

    # MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), stereo;
    # 4000 payload bytes → duration 4000*8/128000 = 0.25 s
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 3996
    meta = _mp3_meta(frame)
    assert meta == (44100, 2, 0, 0.25)

    # behind an ID3v2 tag (syncsafe size 100)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x64" + b"\x00" * 100
    meta2 = _mp3_meta(id3 + frame)
    assert meta2 == (44100, 2, 0, 0.25)

    # MPEG2 Layer III, 64 kbps (idx 8), 22050 Hz (idx 0), mono
    f2 = bytes([0xFF, 0xF3, 0x80, 0xC0]) + b"\x00" * 796
    r2 = _mp3_meta(f2)
    assert r2[0] == 22050 and r2[1] == 1 and r2[3] == 0.1


def test_mp3_meta_rejects_non_mp3():
    from llm_training_data_pipeline_spark.operators.multimodal import _mp3_meta

    assert _mp3_meta(b"") is None
    assert _mp3_meta(b"RIFF" + b"\x00" * 40) is None          # wav magic
    assert _mp3_meta(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 50) is None  # bad bitrate idx
    assert _mp3_meta(bytes([0xFF, 0xE9, 0x90, 0x00]) + b"\x00" * 50) is None  # reserved version


def test_tiff_dims_both_endians_and_negatives():
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import _tiff_dims

    def tiff(bo, w, h):
        # header -> IFD at offset 8 with two SHORT entries
        hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
        entries = struct.pack(bo + "H", 2)
        entries += struct.pack(bo + "HHI", 256, 3, 1) + struct.pack(bo + "H", w) + b"\x00\x00"
        entries += struct.pack(bo + "HHI", 257, 4, 1) + struct.pack(bo + "I", h)
        return hdr + entries + struct.pack(bo + "I", 0)

    assert _tiff_dims(tiff("<", 640, 480)) == (640, 480)
    assert _tiff_dims(tiff(">", 31, 17)) == (31, 17)
    assert _tiff_dims(b"II*\x00\x00\x00") is None
    assert _tiff_dims(b"notatiff") is None


def test_ogg_opus_meta_parses_head_and_duration():
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import _ogg_opus_meta

    def ogg_page(granule, payload, first=False):
        seg = bytes([len(payload)])
        return (
            b"OggS" + b"\x00" + (b"\x02" if first else b"\x04")
            + struct.pack("<q", granule) + b"\x00" * 12 + b"\x01" + seg + payload
        )

    opus_head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + b"\x00" * 3
    )
    stream = ogg_page(0, opus_head, first=True) + ogg_page(96312, b"\x00" * 10)
    meta = _ogg_opus_meta(stream)
    assert meta == (48000, 2, 0, 2.0)  # (96312 - 312) / 48000
    assert _ogg_opus_meta(b"OggS" + b"\x00" * 50) is None  # no OpusHead
    assert _ogg_opus_meta(b"") is None


def test_ogg_opus_meta_truncated_payload_returns_none():
    """Review repro: payload passing the length+magic checks but ending
    right after 'OpusHead' must yield None, not IndexError."""
    from llm_training_data_pipeline_spark.operators.multimodal import _ogg_opus_meta

    trunc = b"OggS" + b"\x00" * 22 + bytes([20]) + b"\x00" * 20 + b"OpusHead"
    assert _ogg_opus_meta(trunc) is None


def test_media_exact_dedup_min_id_winner(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        media_exact_dedup,
    )

    assets = spark.createDataFrame(
        [
            (3, bytearray(b"\x00\x01\x02")),
            (1, bytearray(b"\x00\x01\x02")),  # dup bytes — lower id wins
            (2, bytearray(b"\xff")),
            (4, bytearray(b"")),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: (r["digest"], r["n_bytes"])
           for r in media_exact_dedup(assets).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1][1] == 3 and got[4][1] == 0


def test_decode_stub_resize_and_frames_plumbing(spark):
    """The r9 deterministic-fake decode path: stub pixels are stable
    across partitionings and marked is_stub; resize_pixels does REAL
    nearest-neighbor index mapping (hand-checked 2x2 -> 4x4); frame
    sampling uses the real MP4 frame count."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    assets = mm.synthetic_assets(spark, n=12)
    a = {r["asset_id"]: r for r in mm.decode_image_stub(assets, 4, 4).collect()}
    b = {
        r["asset_id"]: r
        for r in mm.decode_image_stub(assets.repartition(7), 4, 4).collect()
    }
    assert set(a) == set(b) and len(a) == 12
    for k in a:
        assert bytes(a[k]["pixels"]) == bytes(b[k]["pixels"])  # partition-stable
        assert len(bytes(a[k]["pixels"])) == 4 * 4 * 3
        assert a[k]["is_stub"] is True

    # hand-checked nearest neighbor: a 2x2 image of 4 distinct colors
    # doubles each pixel into a 2x2 block
    quad = bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  9, 9, 9]
    )
    src = spark.createDataFrame(
        [(1, 2, 2, 3, bytearray(quad), True)],
        "asset_id long, width int, height int, channels int, "
        "pixels binary, is_stub boolean",
    )
    out = mm.resize_pixels(src, 4, 4).collect()[0]
    arr = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(4, 4, 3)
    assert (arr[0, 0] == [255, 0, 0]).all() and (arr[0, 1] == [255, 0, 0]).all()
    assert (arr[1, 1] == [255, 0, 0]).all() and (arr[0, 3] == [0, 255, 0]).all()
    assert (arr[3, 0] == [0, 0, 255]).all() and (arr[3, 3] == [9, 9, 9]).all()
    assert out["is_stub"] is True  # marker survives

    vids = mm.synthetic_video_assets(spark, n=4)
    frames = mm.sample_frames_stub(vids, every_n=10).collect()
    by_asset: dict = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_index"])
    # fixture writes a real stsz with 20 + 3i samples per asset i
    for aid, idxs in by_asset.items():
        expect = list(range(0, 20 + 3 * aid, 10))
        assert sorted(idxs) == expect, (aid, idxs, expect)
    assert set(by_asset) == {0, 1, 2, 3}
    for r in frames:
        assert r["is_stub"] is True
        assert len(bytes(r["pixels"])) == 8 * 8 * 3
    # two frames of the same asset differ (index-salted keystream)
    p0 = [bytes(r["pixels"]) for r in frames if r["asset_id"] == 3]
    assert len(set(p0)) == len(p0)


def test_bmp_pixels_known_image_exact():
    """Hand-built 2x2 bottom-up BMP with known colors decodes to the
    exact RGB bytes — the first REAL (non-stub) pixel decode."""
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _bmp_pixels,
    )

    # top row: red, green; bottom row: blue, white — stored bottom-up
    w, h = 2, 2
    row_size = (w * 3 + 3) & ~3  # 8 (2 bytes padding)
    bottom = bytes((255, 0, 0)) + bytes((255, 255, 255)) + b"\x00\x00"  # BGR!
    top = bytes((0, 0, 255)) + bytes((0, 255, 0)) + b"\x00\x00"
    img = bottom + top  # bottom-up storage: last row first
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                      2835, 2835, 0, 0)
    )
    got = _bmp_pixels(hdr + img)
    assert got is not None
    gw, gh, rgb = got
    assert (gw, gh) == (2, 2)
    # normalized top-down RGB: red, green / blue, white
    assert rgb == bytes(
        (255, 0, 0, 0, 255, 0) + (0, 0, 255, 255, 255, 255)
    )


def test_bmp_pixels_rejects_unsupported():
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _bmp_pixels,
    )

    assert _bmp_pixels(b"") is None
    assert _bmp_pixels(b"BM" + b"\x00" * 60) is None  # bpp 0
    # 8bpp rejected
    hdr8 = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    )
    assert _bmp_pixels(hdr8 + b"\x00" * 64) is None
    # truncated pixel array rejected
    hdr24 = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    assert _bmp_pixels(hdr24 + b"\x00" * 10) is None
    # PNG magic is not a BMP
    assert _bmp_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 60) is None


def test_decode_bmp_pixels_matches_formula(spark):
    """Every decoded byte of the synthetic fixture matches the
    independent per-pixel formula — top-down and bottom-up files both
    normalize to the same top-down RGB layout, padding stripped."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_bmp_pixels,
        synthetic_bmp_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_bmp_pixels(synthetic_bmp_assets(spark, n=12)).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        w, h = 3 + (i % 5), 2 + (i % 4)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["is_stub"] is False
        px = bytes(r["pixels"])
        assert len(px) == w * h * 3
        for y in range(h):
            for x in range(w):
                o = (y * w + x) * 3
                assert px[o] == (x * 37 + i) % 256  # R
                assert px[o + 1] == (y * 53 + i) % 256  # G
                assert px[o + 2] == (x + y + i) % 256  # B


def test_decode_pnm_pixels_matches_formula(spark):
    """VERDICT r11 next #8 — the second real decoder: every decoded byte
    of the P5/P6 fixture matches the independent per-sample formula;
    grayscale replicates to r=g=b; header comments are tokenized past."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_pnm_pixels,
        synthetic_pnm_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_pnm_pixels(synthetic_pnm_assets(spark, n=12)).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        w, h = 3 + (i % 5), 2 + (i % 4)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["is_stub"] is False
        px = bytes(r["pixels"])
        assert len(px) == w * h * 3
        gray = i % 2 == 1
        for y in range(h):
            for x in range(w):
                o = (y * w + x) * 3
                if gray:
                    g = (x * 41 + y * 17 + i) % 256
                    assert px[o] == px[o + 1] == px[o + 2] == g
                else:
                    assert px[o] == (x * 37 + i) % 256
                    assert px[o + 1] == (y * 53 + i) % 256
                    assert px[o + 2] == (x + y + i) % 256


def test_pnm_pixels_rejects_malformed(spark):
    """Honest None for anything the pure-arithmetic path can't decode:
    ASCII PNM (P2/P3), 16-bit maxval, truncated planes, missing
    post-maxval whitespace, junk."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _pnm_pixels,
    )

    assert _pnm_pixels(b"") is None
    assert _pnm_pixels(b"P2\n2 2\n255\n0 1 2 3") is None  # ASCII variant
    assert _pnm_pixels(b"P6\n2 2\n65535\n" + b"\x00" * 24) is None  # 16-bit
    assert _pnm_pixels(b"P6\n2 2\n255\n" + b"\x00" * 11) is None  # truncated
    assert _pnm_pixels(b"P6\n2 2\n255") is None  # nothing after maxval
    assert _pnm_pixels(b"not an image") is None
    # and a well-formed minimal P6 decodes
    got = _pnm_pixels(b"P6\n# c\n2 1\n255\n" + bytes(range(6)))
    assert got is not None
    w, h, px = got
    assert (w, h) == (2, 1) and px == bytes(range(6))


def test_png_unfilter_inverts_forward_filtering():
    """r12 — the third real decoder, first compressed format: the
    decoder's unfiltering is pinned against the INDEPENDENT forward
    direction (_png_build applies filt = orig − predictor per the spec;
    the decoder must reconstruct orig) for every color type × every
    filter pattern, including multi-IDAT framing. A decoder that
    mirrored its own math instead of inverting the spec's would fail
    this round-trip."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _png_build,
        _png_pixels,
    )

    w, h = 7, 6
    for ct in (0, 2, 3, 4, 6):
        bpp = _PNG_CHANNELS[ct]
        rng = np.random.RandomState(ct + 1)
        if ct == 3:
            px = rng.randint(0, 16, size=(h, w, 1), dtype=np.uint8)
            pal = bytes(rng.randint(0, 256, size=48, dtype=np.uint8))
        else:
            px = rng.randint(0, 256, size=(h, w, bpp), dtype=np.uint8)
            pal = None
        for filters in (
            [0] * h, [1] * h, [2] * h, [3] * h, [4] * h,
            [(y * 3 + 1) % 5 for y in range(h)],
        ):
            png = _png_build(
                w, h, ct, px.tobytes(), filters, palette=pal, idat_split=5
            )
            got = _png_pixels(png)
            assert got is not None, (ct, filters)
            gw, gh, rgb = got
            arr = np.frombuffer(rgb, np.uint8).reshape(gh, gw, 3)
            if ct == 0:
                exp = np.repeat(px, 3, axis=2)
            elif ct == 2:
                exp = px
            elif ct == 3:
                exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
                    px.reshape(h, w)
                ]
            elif ct == 4:
                exp = np.repeat(px[..., :1], 3, axis=2)
            else:
                exp = px[..., :3]
            assert (gw, gh) == (w, h) and np.array_equal(arr, exp), (
                ct,
                filters,
            )


def test_decode_png_pixels_matches_formula(spark):
    """Every decoded byte of the Spark-side PNG fixture matches the
    independent per-sample formula — gray and gray+alpha replicate to
    r=g=b, RGBA drops alpha, palette indices resolve through PLTE."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        synthetic_png_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_png_pixels(synthetic_png_assets(spark, n=15)).collect()
    }
    assert len(out) == 15
    for i, r in out.items():
        w, h = 3 + (i % 5), 2 + (i % 4)
        ct = (2, 0, 6, 3, 4)[i % 5]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["is_stub"] is False
        px = bytes(r["pixels"])
        assert len(px) == w * h * 3
        for y in range(h):
            for x in range(w):
                o = (y * w + x) * 3
                if ct == 2 or ct == 6:
                    assert px[o] == (x * 37 + i) % 256
                    assert px[o + 1] == (y * 53 + i) % 256
                    assert px[o + 2] == (x + y + i) % 256
                elif ct in (0, 4):
                    g = (x * 37 + i) % 256
                    assert px[o] == px[o + 1] == px[o + 2] == g
                else:  # palette
                    j = (x + y + i) % 16
                    assert px[o] == (j * 16) % 256
                    assert px[o + 1] == (j * 7 + i) % 256
                    assert px[o + 2] == (255 - j * 16) % 256


def test_png_pixels_rejects_unsupported():
    """Honest None outside the decoded profile: bad signature, 16-bit
    depth, Adam7 interlace, truncated stream, corrupt zlib, palette
    index past PLTE, unknown filter type."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _png_build,
        _png_pixels,
    )

    good = _png_build(3, 3, 2, bytes(range(27)), [0, 1, 2])
    assert _png_pixels(good) is not None
    assert _png_pixels(b"not a png") is None
    assert _png_pixels(good[:24]) is None  # truncated mid-IHDR
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit-depth byte
    assert _png_pixels(bytes(bad)) is None
    bad = bytearray(good)
    bad[28] = 1  # IHDR interlace byte -> Adam7
    assert _png_pixels(bytes(bad)) is None
    # corrupt the deflate stream (first IDAT data byte)
    bad = bytearray(good)
    idat_at = bytes(bad).index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    assert _png_pixels(bytes(bad)) is None
    # 3-entry palette, index 15 out of range
    assert (
        _png_pixels(
            _png_build(2, 2, 3, bytes([0, 1, 2, 15]), [0, 0], palette=bytes(9))
        )
        is None
    )
    # unknown filter type byte survives deflate but fails unfiltering
    import zlib

    raw = b"\x05" + bytes(9) + b"\x00" + bytes(9)  # filter 5 on row 0
    hacked = _png_build(3, 2, 2, bytes(18), [0, 0])
    pre, post = hacked.split(b"IDAT", 1)
    comp = zlib.compress(raw)
    rebuilt = (
        pre[:-4]
        + len(comp).to_bytes(4, "big")
        + b"IDAT"
        + comp
        + (zlib.crc32(b"IDAT" + comp) & 0xFFFFFFFF).to_bytes(4, "big")
        + post[post.index(b"\x00\x00\x00\x00IEND") :]
    )
    assert _png_pixels(rebuilt) is None


def test_gif_lzw_decode_inverts_forward_compression():
    """r12 — the fourth real decoder: GIF LZW decode pinned against the
    INDEPENDENT forward compressor (greedy longest-match table build;
    the decoder must replay the table one emit-step behind), across
    palette sizes, interlacing, local color tables and extension
    blocks, plus a 40k-pixel stream that crosses the 4096-entry
    table-full CLEAR reset."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _gif_build,
        _gif_lzw_decode,
        _gif_lzw_encode,
        _gif_pixels,
    )

    w, h = 9, 7
    for n_colors in (2, 4, 16, 256):
        for interlace in (False, True):
            for local_ct in (False, True):
                rng = np.random.RandomState(
                    n_colors + interlace * 3 + local_ct * 5
                )
                pal = bytes(rng.randint(0, 256, 3 * n_colors, dtype=np.uint8))
                idx = bytes(rng.randint(0, n_colors, w * h, dtype=np.uint8))
                gif = _gif_build(
                    w, h, pal, idx, interlace, local_ct,
                    with_extensions=interlace,
                )
                got = _gif_pixels(gif)
                assert got is not None, (n_colors, interlace, local_ct)
                gw, gh, rgb = got
                exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
                    np.frombuffer(idx, np.uint8).reshape(h, w)
                ]
                assert (gw, gh) == (w, h)
                assert np.array_equal(
                    np.frombuffer(rgb, np.uint8).reshape(gh, gw, 3), exp
                ), (n_colors, interlace, local_ct)
    big = bytes(
        np.random.RandomState(0).randint(0, 256, 200 * 200, dtype=np.uint8)
    )
    assert _gif_lzw_decode(_gif_lzw_encode(big, 8), 8) == big


def test_decode_gif_pixels_matches_formula(spark):
    """Every decoded byte of the Spark-side GIF fixture matches the
    independent per-sample formula through the palette indirection."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        synthetic_gif_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_gif_pixels(synthetic_gif_assets(spark, n=12)).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        w, h = 3 + (i % 5), 2 + (i % 4)
        n_colors = (4, 16, 256)[i % 3]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["is_stub"] is False
        px = bytes(r["pixels"])
        assert len(px) == w * h * 3
        for y in range(h):
            for x in range(w):
                j = (x * 5 + y * 3 + i) % n_colors
                o = (y * w + x) * 3
                assert px[o] == (j * 31 + i) % 256
                assert px[o + 1] == (j * 7) % 256
                assert px[o + 2] == (255 - j) % 256


def test_gif_pixels_rejects_malformed():
    """Honest None outside the decoded profile: bad signature,
    truncated stream, trailer before any image, missing color table,
    index stream shorter than w*h."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _gif_build,
        _gif_pixels,
    )

    good = _gif_build(3, 3, bytes(12), bytes(9))
    assert _gif_pixels(good) is not None
    assert _gif_pixels(b"not a gif") is None
    assert _gif_pixels(b"GIF89a") is None
    assert _gif_pixels(good[:15]) is None
    # trailer with no image descriptor
    assert (
        _gif_pixels(
            b"GIF89a" + bytes((3, 0, 3, 0, 0, 0, 0)) + b"\x3b"
        )
        is None
    )
    # descriptor claims 4x4 but only 3x3 indices were encoded: patch the
    # image-descriptor dims (bytes 5-8 after the 0x2C at offset 19)
    short = bytearray(good)
    at = short.index(0x2C)
    short[at + 5 : at + 9] = (4).to_bytes(2, "little") + (4).to_bytes(
        2, "little"
    )
    assert _gif_pixels(bytes(short)) is None


def test_jpeg_decode_inverts_forward_encoding():
    """r12 — the fifth real decoder retires the last gated image
    format: baseline JPEG decode pinned against the INDEPENDENT
    forward encoder (_jpeg_build: RGB→YCbCr, DCT, quantize, DC-diff +
    run-length Huffman with stream-derived DHT tables). JPEG is lossy,
    so the pins are tolerances, tightest first: EXACT for a constant
    gray image (DC-only, all-ones quant), ±1 for random gray (DCT
    float rounding only), ±3 for color (color-convert rounding both
    directions), 4:2:0 with 2x2-constant content (subsampling exactly
    invertible), restart-marker streams, and a coarse-quant file whose
    mean luminance must survive (DC path)."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _JPEG_DEMO_QUANT,
        _jpeg_build,
        _jpeg_pixels,
    )

    def delta(a, b):
        return int(np.max(np.abs(a.astype(np.int32) - b.astype(np.int32))))

    rng = np.random.RandomState(7)
    g = np.full((16, 24), 97, np.uint8)
    w, h, rgb = _jpeg_pixels(_jpeg_build(24, 16, g.tobytes(), gray=True))
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (w, h) == (24, 16) and delta(arr[..., 0], g) == 0
    assert np.array_equal(arr[..., 0], arr[..., 1])
    assert np.array_equal(arr[..., 1], arr[..., 2])

    g = rng.randint(0, 256, (24, 17), np.uint8)  # non-multiple-of-8
    w, h, rgb = _jpeg_pixels(_jpeg_build(17, 24, g.tobytes(), gray=True))
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (w, h) == (17, 24) and delta(arr[..., 0], g) <= 1

    im = rng.randint(0, 256, (16, 16, 3), np.uint8)
    w, h, rgb = _jpeg_pixels(_jpeg_build(16, 16, im.tobytes()))
    assert delta(np.frombuffer(rgb, np.uint8).reshape(16, 16, 3), im) <= 3

    base = rng.randint(0, 200, (8, 8, 3), np.uint8)
    im = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    w, h, rgb = _jpeg_pixels(
        _jpeg_build(16, 16, im.tobytes(), subsample=True)
    )
    assert delta(np.frombuffer(rgb, np.uint8).reshape(16, 16, 3), im) <= 3

    im = rng.randint(0, 256, (24, 40, 3), np.uint8)
    w, h, rgb = _jpeg_pixels(_jpeg_build(40, 24, im.tobytes(), restart=2))
    assert delta(np.frombuffer(rgb, np.uint8).reshape(24, 40, 3), im) <= 3

    im = rng.randint(0, 256, (32, 32, 3), np.uint8)
    got = _jpeg_pixels(
        _jpeg_build(32, 32, im.tobytes(), quant=_JPEG_DEMO_QUANT)
    )
    assert got is not None
    arr = np.frombuffer(got[2], np.uint8).reshape(32, 32, 3)
    assert abs(float(arr.mean()) - float(im.mean())) <= 4.0


def test_jpeg_pixels_rejects_unsupported():
    """Honest None outside the supported profiles: junk after SOI,
    truncated streams, and a BASELINE scan mislabeled as progressive
    (SOF2 requires DC scans to carry Ss=Se=0; a baseline Ss=0/Se=63
    SOS under a progressive frame header is corrupt, r13)."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _jpeg_build,
        _jpeg_pixels,
    )

    good = _jpeg_build(
        16, 16,
        np.random.RandomState(0)
        .randint(0, 256, (16, 16, 3), np.uint8)
        .tobytes(),
    )
    assert _jpeg_pixels(good) is not None
    assert _jpeg_pixels(b"not a jpeg") is None
    assert _jpeg_pixels(b"\xff\xd8junk") is None
    assert _jpeg_pixels(good[:40]) is None
    prog = bytearray(good)
    at = bytes(prog).index(b"\xff\xc0")
    prog[at + 1] = 0xC2  # progressive frame marker, baseline scan
    assert _jpeg_pixels(bytes(prog)) is None
    lossless = bytearray(good)
    lossless[at + 1] = 0xC3  # lossless frame type stays rejected
    assert _jpeg_pixels(bytes(lossless)) is None


def test_decode_jpeg_pixels_within_tolerance(spark):
    """The Spark-side JPEG fixture reconstructs within ±3 of the
    formula pixels through the full mapInPandas path (exactly the
    tolerance the lossy codec permits at all-ones quant); gray files
    replicate to r=g=b."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthetic_jpeg_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_jpeg_pixels(
            synthetic_jpeg_assets(spark, n=12)
        ).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        kind = i % 3
        if kind == 2:
            w, h = 8 + 2 * (i % 3), 6 + 2 * (i % 2)
        else:
            w, h = 7 + (i % 6), 5 + (i % 5)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["is_stub"] is False
        arr = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(h, w, 3)
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        if kind == 0:
            exp1 = ((xs * 37 + ys * 11 + i) % 256).astype(np.int32)
            assert np.array_equal(arr[..., 0], arr[..., 1])
            assert np.array_equal(arr[..., 1], arr[..., 2])
            assert int(np.max(np.abs(arr[..., 0].astype(np.int32) - exp1))) <= 1
            continue
        if kind == 2:
            xs, ys = xs // 2 * 2, ys // 2 * 2
        exp = np.stack(
            [
                (xs * 37 + i) % 256 + np.zeros((h, w), np.int64),
                (ys * 53 + i) % 256 + np.zeros((h, w), np.int64),
                (xs + ys + i) % 256,
            ],
            axis=2,
        ).astype(np.int32)
        assert int(np.max(np.abs(arr.astype(np.int32) - exp))) <= 3, i


def test_aiff_au_decoders_match_formula_and_g711_table():
    """r12 — the audio family goes multi-container: AIFF (big-endian,
    80-bit extended-float rate, signed 8-bit per spec) and AU (BE PCM +
    G.711 mu-law) decode pinned against forward builders and the
    PUBLISHED mu-law expansion values; AIFC / float-AU / truncated
    streams reject."""
    import struct

    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _aiff_build,
        _aiff_pcm_samples,
        _au_build,
        _au_samples,
        _ieee754_extended_from_int,
        _ieee754_extended_to_int,
        _sniff_audio_samples,
        _ulaw_expand_table,
    )

    for r in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 1):
        assert _ieee754_extended_to_int(_ieee754_extended_from_int(r)) == r

    # published G.711 decode-table anchors (max, zero codes, segment
    # boundaries) — independent of the formula implementation
    t = _ulaw_expand_table()
    for code, lin in (
        (0x80, 32124), (0x00, -32124), (0xFF, 0), (0x7F, 0),
        (0xF0, 120), (0x70, -120), (0xEF, 132), (0x6F, -132),
    ):
        assert t[code] == lin, hex(code)

    vals = [((k * 31 + 7) % 65536) - 32768 for k in range(20)]
    pcm = b"".join(struct.pack(">h", v) for v in vals)
    rate, ch, nf, raw = _aiff_pcm_samples(
        _aiff_build(44100, 2, 16, pcm, junk=True)
    )
    assert (rate, ch, nf) == (44100, 2, 10)
    assert list(np.frombuffer(raw, "<i4")) == vals

    vals8 = [((k * 13 + 5) % 256) - 128 for k in range(15)]
    pcm8 = b"".join(struct.pack("b", v) for v in vals8)
    got = _aiff_pcm_samples(_aiff_build(8000, 1, 8, pcm8))
    assert got and list(np.frombuffer(got[3], "<i4")) == vals8

    got = _au_samples(_au_build(16000, 2, 3, pcm, b"anno"))
    assert got and got[:3] == (16000, 2, 10)
    assert list(np.frombuffer(got[3], "<i4")) == vals

    codes = bytes(range(30))
    got = _au_samples(_au_build(8000, 1, 1, codes))
    assert got and list(np.frombuffer(got[3], "<i4")) == [
        int(t[c]) for c in codes
    ]
    # size 0xFFFFFFFF = until-EOF per spec
    p = _au_build(8000, 1, 2, bytes(range(10)))
    got = _au_samples(p[:8] + b"\xff\xff\xff\xff" + p[12:])
    assert got and got[2] == 10

    assert _sniff_audio_samples(b"garbage") is None
    aifc = bytearray(_aiff_build(8000, 1, 16, pcm))
    aifc[8:12] = b"AIFC"
    assert _aiff_pcm_samples(bytes(aifc)) is None
    assert _aiff_pcm_samples(_aiff_build(8000, 1, 16, pcm)[:20]) is None
    assert _aiff_pcm_samples(_aiff_build(8000, 1, 16, pcm)[:40]) is None
    assert _au_samples(_au_build(8000, 1, 6, pcm)) is None  # float enc
    # 24-bit AIFF rejects: patch COMM sampleSize
    b24 = bytearray(_aiff_build(8000, 1, 16, pcm))
    at = bytes(b24).index(b"COMM") + 8 + 6
    b24[at : at + 2] = (24).to_bytes(2, "big")
    assert _aiff_pcm_samples(bytes(b24)) is None


def test_decode_audio_samples_sniffs_mixed_containers(spark):
    """The mixed fixture decodes every row through one operator; each
    container kind's int32 samples match the per-sample formula (mu-law
    rows via the canonical expansion of the stored code bytes)."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _ulaw_expand_table,
        decode_audio_samples,
        synthetic_mixed_audio_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_audio_samples(
            synthetic_mixed_audio_assets(spark, n=24)
        ).collect()
    }
    assert len(out) == 24
    t = _ulaw_expand_table()
    for i, r in out.items():
        kind = i % 8  # r13: FLAC joined; r14: float32 WAV + AIFC sowt
        rate = (8000, 16000, 22050, 44100, 48000)[i % 5]
        channels = 1 + (i % 2)
        n_frames = 16 + (i % 5)
        count = n_frames * channels
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == (
            rate, channels, n_frames,
        )
        assert r["is_stub"] is False
        arr = list(np.frombuffer(bytes(r["samples"]), "<i4"))
        vals16 = [((k * 31 + i * 7) % 65536) - 32768 for k in range(count)]
        if kind in (0, 1, 3, 5, 7):  # PCM containers, FLAC, AIFC sowt
            exp = vals16
        elif kind == 2:
            exp = [((k * 13 + i * 5) % 256) - 128 for k in range(count)]
        elif kind == 6:  # float32 WAV: the pinned _float_to_int32 scale
            f32 = np.array([v / 32768.0 for v in vals16], np.float32)
            exp = list(
                np.rint(f32.astype(np.float64) * 2147483647.0).astype(np.int32)
            )
        else:
            exp = [int(t[(k * 17 + i * 3) % 256]) for k in range(count)]
        assert arr == exp, i


def test_perceptual_hash_is_reencoding_invariant():
    """r12 — perceptual image dedup: the same pixels re-encoded as
    BMP / PNG / GIF / PackBits-TIFF / near-lossless JPEG produce the
    SAME pHash (hamming 0) while the 6 distinct base patterns stay
    >= 22 bits apart; dhash and ahash are re-encode-invariant too."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _bmp_build,
        _cross_format_base_pixels,
        _gif_from_rgb,
        _jpeg_build,
        _perceptual_hash_bits,
        _png_build,
        _sniff_image_pixels,
    )

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _tiff_build,
    )

    hashes = {}
    for b in range(6):
        img = _cross_format_base_pixels(b)
        h, w, _ = img.shape
        payloads = (
            _bmp_build(img),
            _png_build(w, h, 2, img.tobytes(), [0] * h),
            _gif_from_rgb(img),
            _tiff_build(img, packbits=True),
            _jpeg_build(w, h, img.tobytes()),
        )
        per_fmt = []
        for p in payloads:
            got = _sniff_image_pixels(p)
            assert got is not None and (got[0], got[1]) == (w, h)
            per_fmt.append(
                {
                    m: _perceptual_hash_bits(got[2], w, h, m)
                    & ((1 << 64) - 1)
                    for m in ("phash", "dhash", "ahash")
                }
            )
        for m in ("phash", "dhash", "ahash"):
            lossless = {d[m] for d in per_fmt[:4]}
            assert len(lossless) == 1, (b, m, lossless)
            jpeg_d = bin(per_fmt[0][m] ^ per_fmt[4][m]).count("1")
            if m == "phash":
                # DCT low-frequency signs absorb the ±1 JPEG noise
                assert jpeg_d == 0, (b, m, jpeg_d)
            else:
                # dhash/ahash compare raw pixels: ±1 noise at an exact
                # tie can flip a bit — still trivially inside the
                # near-dup threshold
                assert jpeg_d <= 2, (b, m, jpeg_d)
        hashes[b] = per_fmt[0]["phash"]
    for a in range(6):
        for b in range(a + 1, 6):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            assert d >= 22, (a, b, d)


def test_image_near_dup_pairs_recovers_reencode_clusters(spark):
    """End to end through Spark: 30 byte-distinct files (6 patterns x
    5 containers) must yield exactly the 60 within-cluster pairs at
    hamming 0 and no cross-cluster pair — the signal byte-digest dedup
    cannot see."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        image_near_dup_pairs,
        synthetic_cross_format_assets,
    )

    pairs = image_near_dup_pairs(
        synthetic_cross_format_assets(spark, n_base=6)
    ).collect()
    assert len(pairs) == 60
    for r in pairs:
        assert r["id_a"] // 5 == r["id_b"] // 5, (r["id_a"], r["id_b"])
        assert r["hamming"] == 0
    got_clusters = {}
    for r in pairs:
        got_clusters.setdefault(r["id_a"] // 5, set()).update(
            (r["id_a"], r["id_b"])
        )
    assert len(got_clusters) == 6
    for b, members in got_clusters.items():
        assert members == {5 * b + k for k in range(5)}


def test_decode_image_pixels_sniffs_mixed_formats(spark):
    """The sniffing image decoder routes every container of the
    cross-format fixture to the right decoder (all 24 rows decode at
    the fixture dims, is_stub false)."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthetic_cross_format_assets,
    )

    out = decode_image_pixels(
        synthetic_cross_format_assets(spark, n_base=6)
    ).collect()
    assert len(out) == 30
    for r in out:
        assert (r["width"], r["height"]) == (48, 32)
        assert r["is_stub"] is False


def test_gif_animation_frames_decode_as_stored():
    """r12 — animated GIFs: every stored frame round-trips through the
    frame walker (local color tables, mixed interlacing), the
    first-frame _gif_pixels contract is unchanged, and max_frames
    stops the walk early."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _cross_format_base_pixels,
        _gif_build_animation,
        _gif_frames,
        _gif_pixels,
    )

    frames = [_cross_format_base_pixels(f % 6) for f in range(5)]
    gif = _gif_build_animation(frames, interlace_every=3)
    got = _gif_frames(gif)
    assert got is not None and len(got) == 5
    for f, (w, h, rgb) in enumerate(got):
        assert (w, h) == (48, 32)
        assert np.array_equal(
            np.frombuffer(rgb, np.uint8).reshape(h, w, 3), frames[f]
        ), f
    w, h, rgb = _gif_pixels(gif)
    assert np.array_equal(
        np.frombuffer(rgb, np.uint8).reshape(h, w, 3), frames[0]
    )
    assert len(_gif_frames(gif, max_frames=2)) == 2
    assert _gif_frames(b"GIF89a") is None


def test_sample_gif_frames_real_pixels(spark):
    """End to end through Spark: every-2nd-frame GIF sampling yields
    is_stub=false FRAME_SCHEMA rows matching the per-frame pattern
    exactly (GIF is lossless); frame 0 always included."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _cross_format_base_pixels,
        sample_gif_frames,
        synthetic_animated_gif_assets,
    )

    rows = sample_gif_frames(
        synthetic_animated_gif_assets(spark, n=4), every_n=2
    ).collect()
    by_asset = {}
    for r in rows:
        assert r["is_stub"] is False
        assert (r["width"], r["height"], r["channels"]) == (48, 32, 3)
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {0, 1, 2, 3}
    for i, rs in by_asset.items():
        n_frames = 3 + (i % 4)
        assert sorted(r["frame_index"] for r in rs) == list(
            range(0, n_frames, 2)
        )
        for r in rs:
            exp = _cross_format_base_pixels((i + r["frame_index"]) % 6)
            arr = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(
                32, 48, 3
            )
            assert np.array_equal(arr, exp), (i, r["frame_index"])


def test_avi_mjpeg_walk_and_frame_decode():
    """r12 — the video family's first real frame path: the AVI RIFF
    walk recovers dims/fps/frame payloads built by the independent
    forward builder, and every frame decodes through the real JPEG
    decoder to within the lossy tolerance of its source pattern."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _avi_build,
        _avi_mjpeg_frames,
        _cross_format_base_pixels,
        _jpeg_pixels,
    )

    frames = [_cross_format_base_pixels(f % 6) for f in range(6)]
    avi = _avi_build(frames, fps=25)
    got = _avi_mjpeg_frames(avi)
    assert got is not None
    w, h, fps_milli, jpegs = got
    assert (w, h, len(jpegs)) == (48, 32, 6)
    assert fps_milli == 10**9 // (10**6 // 25)
    for f, j in enumerate(jpegs):
        fw, fh, rgb = _jpeg_pixels(j)
        arr = np.frombuffer(rgb, np.uint8).reshape(fh, fw, 3)
        exp = _cross_format_base_pixels(f % 6)
        assert int(np.max(np.abs(arr.astype(int) - exp.astype(int)))) <= 3

    assert _avi_mjpeg_frames(b"RIFFxxxxWAVE") is None
    assert _avi_mjpeg_frames(avi[:40]) is None
    assert _avi_mjpeg_frames(avi[:200]) is None
    assert _avi_mjpeg_frames(b"junk") is None
    bad = bytearray(avi)
    at = bytes(bad).index(b"avih") + 8
    bad[at : at + 4] = b"\x00\x00\x00\x00"  # zero frame period
    assert _avi_mjpeg_frames(bytes(bad)) is None


def test_sample_avi_frames_real_pixels(spark):
    """End to end through Spark: every-2nd-frame sampling yields
    is_stub=false FRAME_SCHEMA rows whose pixels match the per-frame
    pattern within the JPEG tolerance; frame 0 always included."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _cross_format_base_pixels,
        sample_avi_frames,
        synthetic_mjpeg_avi_assets,
    )

    rows = sample_avi_frames(
        synthetic_mjpeg_avi_assets(spark, n=4), every_n=2
    ).collect()
    by_asset = {}
    for r in rows:
        assert r["is_stub"] is False
        assert (r["width"], r["height"], r["channels"]) == (48, 32, 3)
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {0, 1, 2, 3}
    for i, rs in by_asset.items():
        n_frames = 4 + (i % 4)
        assert sorted(r["frame_index"] for r in rs) == list(
            range(0, n_frames, 2)
        )
        for r in rs:
            exp = _cross_format_base_pixels((i + r["frame_index"]) % 6)
            arr = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(
                32, 48, 3
            )
            assert (
                int(np.max(np.abs(arr.astype(int) - exp.astype(int)))) <= 3
            )


def test_decode_bomb_payloads_reject_cheaply():
    """r12 review findings: crafted sub-KB headers must not make an
    executor allocate gigabytes — PNG inflate is bounded by the
    declared size, GIF LZW output is capped at w*h, JPEG plane
    allocation and PNG dims are gated at _MAX_DECODE_PIXELS, and audio
    headers with int32-overflowing rate/channel fields reject BEFORE
    the Arrow batch (where they would kill the task outside the
    per-row guard)."""
    import struct
    import zlib

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    # audio: u32 header fields past the int32 samples schema
    p = b".snd" + struct.pack(">IIIII", 24, 4, 2, 0x80000000, 1) + bytes(4)
    assert mm._au_samples(p) is None
    p = b".snd" + struct.pack(">IIIII", 24, 4, 2, 8000, 0x80000000) + bytes(4)
    assert mm._au_samples(p) is None
    aiff = bytearray(mm._aiff_build(8000, 1, 16, bytes(8)))
    at = bytes(aiff).index(b"COMM") + 16
    aiff[at : at + 2] = b"\x7f\xff"  # 80-bit extended inf/NaN exponent
    assert mm._aiff_pcm_samples(bytes(aiff)) is None
    wav = (
        b"RIFF" + (56).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, 1, 0x80000000, 16000, 2, 16)
        + b"data" + (20).to_bytes(4, "little") + bytes(20)
    )
    assert mm._wav_pcm_samples(wav) is None

    def chunk(t, d):
        return (
            len(d).to_bytes(4, "big") + t + d
            + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # PNG: dims past the pixel cap reject before inflating
    ihdr = (
        (1 << 20).to_bytes(4, "big") + (1 << 12).to_bytes(4, "big")
        + bytes((8, 0, 0, 0, 0))
    )
    bomb = (
        mm._PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(10000)))
        + chunk(b"IEND", b"")
    )
    assert mm._png_pixels(bomb) is None
    # PNG: a high-ratio stream for small declared dims stops at the
    # declared size + 1 (bounded decompressobj), not at full expansion
    ihdr = (
        (4).to_bytes(4, "big") + (4).to_bytes(4, "big")
        + bytes((8, 0, 0, 0, 0))
    )
    overlong = (
        mm._PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(10_000_000)))
        + chunk(b"IEND", b"")
    )
    assert mm._png_pixels(overlong) is None

    # JPEG: SOF0 claiming 65535x65535 rejects before plane allocation
    jp = bytearray(mm._jpeg_build(16, 16, bytes(16 * 16 * 3)))
    at = bytes(jp).index(b"\xff\xc0") + 5
    jp[at : at + 4] = b"\xff\xff\xff\xff"
    assert mm._jpeg_pixels(bytes(jp)) is None

    # GIF: LZW output is capped at the frame's w*h (max_out)
    import random

    rng = random.Random(0)
    big = bytes(rng.randrange(256) for _ in range(100_000))
    comp = mm._gif_lzw_encode(big, 8)
    capped = mm._gif_lzw_decode(comp, 8, max_out=6)
    assert capped is not None and 6 <= len(capped) < 6 + 4096


def test_tiff_decode_inverts_forward_building():
    """r12 — the sixth real decoder: baseline TIFF round-trips across
    both byte orders, none/PackBits compression, gray (both
    photometrics — WhiteIsZero inverted) and RGB, single- and
    multi-strip layouts; LZW and truncated files reject."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(0)
    for bo in ("<", ">"):
        for packbits in (False, True):
            for kind, pm in (("gray", 1), ("gray0", 0), ("rgb", 2)):
                for rps in (None, 5):
                    if kind == "rgb":
                        img = rng.randint(0, 256, (13, 17, 3), np.uint8)
                    else:
                        img = rng.randint(0, 256, (13, 17), np.uint8)
                    t = mm._tiff_build(
                        img, bo, packbits, photometric=pm,
                        rows_per_strip=rps,
                    )
                    got = mm._tiff_pixels(t)
                    assert got is not None, (bo, packbits, kind, rps)
                    w, h, rgb = got
                    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
                    exp = (
                        img if kind == "rgb"
                        else np.repeat(img[..., None], 3, axis=2)
                    )
                    assert (w, h) == (17, 13) and np.array_equal(arr, exp)
                    assert mm._sniff_image_pixels(t) is not None

    # JPEG-in-TIFF compression rejects (tag 259 patched to 7; LZW is
    # supported as of r13 — see test_tiff_lzw_decode_inverts_encoder)
    tjpg = bytearray(mm._tiff_build(np.zeros((4, 4), np.uint8), "<"))
    at = bytes(tjpg).index((259).to_bytes(2, "little"))
    tjpg[at + 8] = 7
    assert mm._tiff_pixels(bytes(tjpg)) is None
    assert mm._tiff_pixels(b"II*\x00" + bytes(4)) is None
    assert (
        mm._tiff_pixels(mm._tiff_build(np.zeros((4, 4), np.uint8), "<")[:30])
        is None
    )


def test_tiff_tiled_decode_inverts_forward_building():
    """r13 — tile layout (tags 322-325, TIFF 6.0 §15): round-trips
    across byte orders, all four codecs, predictor 2, gray and RGB,
    dividing and NON-dividing tile grids (edge tiles are stored
    full-size and must be clipped on paste); mixed strip+tile IFDs
    and oversized tile dims reject."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(7)
    cases = [
        # (tile dims, codec kwargs)
        ((8, 8), {}),                                   # divides 16x24? no: h=13
        ((16, 16), {"lzw": True, "predictor": 2}),      # single edge tile
        ((6, 5), {"packbits": True}),
        ((4, 8), {"deflate": True, "predictor": 2}),
    ]
    for bo in ("<", ">"):
        for kind in ("gray", "rgb"):
            for tile, kw in cases:
                if kind == "rgb":
                    img = rng.randint(0, 256, (13, 17, 3), np.uint8)
                    exp = img
                else:
                    img = rng.randint(0, 256, (13, 17), np.uint8)
                    exp = np.repeat(img[..., None], 3, axis=2)
                t = mm._tiff_build(img, bo, tile=tile, **kw)
                got = mm._tiff_pixels(t)
                assert got is not None, (bo, kind, tile, kw)
                w, h, rgb = got
                arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
                assert (w, h) == (17, 13) and np.array_equal(arr, exp), (
                    bo, kind, tile, kw,
                )
                assert mm._sniff_image_pixels(t) is not None

    # a tiled IFD that ALSO carries strip offsets (tag 273) is
    # malformed — strips and tiles are mutually exclusive
    import struct

    base = mm._tiff_build(
        np.zeros((8, 8), np.uint8), "<", tile=(8, 8)
    )
    n = struct.unpack("<H", base[8:10])[0]
    extra = struct.pack("<HHII", 273, 4, 1, 0)
    bad = (
        base[:8]
        + struct.pack("<H", n + 1)
        + base[10 : 10 + 12 * n]
        + extra
        + base[10 + 12 * n :]
    )
    assert mm._tiff_pixels(bad) is None

    # tile-dim bomb guard: legal-looking header whose PER-TILE buffer
    # (tw*th*spp) exceeds the ceiling rejects before allocating
    bomb = bytearray(mm._tiff_build(np.zeros((8, 8), np.uint8), "<", tile=(8, 8)))
    at = bytes(bomb).index(struct.pack("<HH", 322, 4))
    bomb[at + 8 : at + 12] = struct.pack("<I", 1 << 30)
    assert mm._tiff_pixels(bytes(bomb)) is None


def test_exif_extraction_inverts_forward_builder():
    """r13 — EXIF: the APP1 payload is a TIFF structure; tags written
    by the forward _exif_app1 builder (both byte orders, IFD0 + Exif
    IFD, inline and external values) read back exactly; JPEGs without
    APP1 and TIFFs without the tags yield None; corrupt segments never
    raise; the pixel decoder still decodes EXIF-carrying JPEGs."""
    import random

    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    img = mm._cross_format_base_pixels(2)
    h, w, _ = img.shape
    jpeg = mm._jpeg_build(w, h, img.tobytes())
    for bo in ("<", ">"):
        app1 = mm._exif_app1(
            make="ACME", model="Cam 9", orientation=6,
            datetime="2021:03:04 05:06:07",
            datetime_original="2020:01:02 03:04:05",
            exif_dims=(640, 480), bo=bo,
        )
        j = mm._jpeg_with_exif(jpeg, app1)
        tags = mm._exif_tags(j)
        assert tags == {
            "make": "ACME", "model": "Cam 9", "orientation": 6,
            "datetime": "2021:03:04 05:06:07",
            "datetime_original": "2020:01:02 03:04:05",
            "exif_width": 640, "exif_height": 480,
        }, bo
        # pixels unaffected by the APP1 segment
        assert mm._jpeg_pixels(j) is not None
    # partial tag sets round-trip too
    assert mm._exif_tags(
        mm._jpeg_with_exif(jpeg, mm._exif_app1(orientation=3, bo=">"))
    ) == {"orientation": 3}
    # absent EXIF -> None (JPEG without APP1, TIFF without the tags)
    assert mm._exif_tags(jpeg) is None
    assert mm._exif_tags(mm._tiff_build(np.zeros((4, 4), np.uint8))) is None
    assert mm._exif_tags(b"") is None
    # fuzz: mutations never raise
    rnd = random.Random(2)
    base = mm._jpeg_with_exif(
        jpeg, mm._exif_app1(make="X", orientation=1, exif_dims=(9, 9))
    )
    for _ in range(2000):
        b = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:
            for _ in range(rnd.randrange(1, 4)):
                i = rnd.randrange(len(b))
                b[i] ^= 1 << rnd.randrange(8)
        elif op == 1:
            b = b[: rnd.randrange(1, len(b))]
        else:
            i = rnd.randrange(len(b))
            b[i:i] = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 6)))
        mm._exif_tags(bytes(b))  # must not raise


def test_decode_exif_meta_spark_surface(spark):
    """decode_exif_meta through mapInPandas: EXIF rows carry the
    fixture's fields, no-EXIF rows have has_exif=false with NULLs."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_exif_meta,
        synthetic_exif_assets,
    )

    rows = {r["asset_id"]: r for r in
            decode_exif_meta(synthetic_exif_assets(spark, n=24)).collect()}
    assert len(rows) == 24
    makes = ("Acme", "PixelWorks", "OptiCam", "FotoCorp")
    for i in range(24):
        r = rows[i]
        if i % 4 == 3 or i % 6 == 5:
            assert r["has_exif"] is False and r["make"] is None
            assert r["orientation"] is None
        else:
            assert r["has_exif"] is True
            assert r["make"] == makes[i % 4]
            assert r["orientation"] == 1 + (i % 8)
            assert r["exif_width"] is not None


def test_decoders_never_raise_on_corrupt_input():
    """r12 hardening — at 100 TB one corrupt file must never kill the
    job: every decoder returns None (or a valid tuple) on mutated
    valid files (bit flips, truncations, magic-prefixed garbage),
    never raises. Deterministic 6k-trial slice of the 80k-trial fuzz
    run that found and fixed 4 real holes (GIF LZW >8-bit code size,
    JPEG 16-bit-DQT odd length, JPEG truncated SOF component spec,
    JPEG runaway DC predictor)."""
    import random
    import struct

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    img = mm._cross_format_base_pixels(0)
    h, w, _ = img.shape
    valids = [
        mm._bmp_build(img),
        mm._png_build(w, h, 2, img.tobytes(), [0] * h),
        mm._gif_from_rgb(img),
        mm._jpeg_build(w, h, img.tobytes()),
        mm._jpeg_build(w, h, img.tobytes(), subsample=True, restart=2),
        mm._jpeg_build_progressive(w, h, img.tobytes()),
        mm._jpeg_build_progressive(
            w, h, img.tobytes(), subsample=True, restart=2
        ),
        mm._tiff_build(img, "<", packbits=True),
        mm._tiff_build(img[..., 0], ">", rows_per_strip=7),
        mm._tiff_build(img, "<", lzw=True, predictor=2),
        mm._tiff_build(img, ">", deflate=True, predictor=2),
        mm._tiff_build(img, "<", lzw=True, predictor=2, tile=(16, 16)),
        mm._png_build(
            w, h, 2, img.tobytes(),
            [k % 5 for k in range(
                sum(hp for *_r, hp in mm._adam7_passes(w, h))
            )],
            interlace=True,
        ),
        mm._y4m_build([img, img], "420jpeg"),
        mm._y4m_build([img[..., 0]], "mono"),
        mm._png_build(
            w, h, 2,
            b"".join(bytes((v, 0)) for v in img.tobytes()),
            [4] * h, bit_depth=16,
        ),
        b"P6\n48 32\n255\n" + img.tobytes(),
        mm._avi_build([img, img], fps=25),
        mm._aiff_build(8000, 1, 16, bytes(40)),
        mm._au_build(8000, 1, 1, bytes(30)),
        mm._flac_build(list(range(-50, 50)), block_size=32),
        mm._wav_ima_build(list(range(0, 3000, 3)), block_frames=505),
        b"RIFF" + (56).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + (20).to_bytes(4, "little") + bytes(20),
    ]
    decoders = (
        mm._sniff_image_pixels,
        mm._sniff_audio_samples,
        mm._avi_mjpeg_frames,
        mm._y4m_frames,
    )
    rng = random.Random(20260816)
    for _ in range(6000):
        base = valids[rng.randrange(len(valids))]
        mode = rng.random()
        b = bytearray(base)
        if mode < 0.35:
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            p = bytes(b)
        elif mode < 0.6:
            p = bytes(b[: rng.randrange(len(b) + 1)])
        elif mode < 0.8:
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            p = bytes(b[: rng.randrange(len(b) + 1)])
        else:
            p = bytes(
                rng.randrange(256) for _ in range(rng.randrange(0, 200))
            )
            if rng.random() < 0.5:
                p = base[: rng.randrange(2, 16)] + p
        for fn in decoders:
            fn(p)  # must not raise; None or a tuple both fine


def test_decode_wav_samples_matches_formula(spark):
    """r12 — the audio family's first REAL decoder: every decoded int32
    of the PCM fixture matches the independent per-sample formula
    (16-bit signed passthrough, 8-bit unsigned centered at -128), junk
    chunks walked past, mono/stereo both exact."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_wav_samples,
        synthetic_pcm_wav_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_wav_samples(
            synthetic_pcm_wav_assets(spark, n=12)
        ).collect()
    }
    assert len(out) == 12
    import struct

    for i, r in out.items():
        rate = (8000, 16000, 22050, 44100)[i % 4]
        channels = 1 + (i % 2)
        bits = 16 if i % 2 == 0 else 8
        n_frames = 20 + (i % 5)
        count = n_frames * channels
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == (
            rate, channels, n_frames,
        )
        assert r["is_stub"] is False
        vals = struct.unpack(f"<{count}i", bytes(r["samples"]))
        for k, v in enumerate(vals):
            if bits == 16:
                assert v == ((k * 31 + i * 7) % 65536) - 32768
            else:
                assert v == ((k * 13 + i * 3) % 256) - 128


def test_wav_pcm_samples_rejects_non_pcm(spark):
    """Honest None for non-PCM (float tag), odd bit widths, truncated
    data, non-RIFF junk (24/32-bit integer PCM decode as of r13 — see
    test_pcm_24_and_32_bit_widths_decode)."""
    import struct as _s

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _wav_pcm_samples,
    )

    def wav(fmt_tag=1, bits=16, data=b"\x00\x00"):
        fmt = b"fmt " + _s.pack("<IHHIIHH", 16, fmt_tag, 1, 8000,
                                8000 * bits // 8, bits // 8, bits)
        body = b"WAVE" + fmt + b"data" + _s.pack("<I", len(data)) + data
        return b"RIFF" + _s.pack("<I", len(body)) + body

    assert _wav_pcm_samples(b"") is None
    assert _wav_pcm_samples(b"RIFFxxxxNOPE") is None
    # IEEE float (tag 3) decodes as of r14 — but only at 32/64 bits
    assert _wav_pcm_samples(wav(fmt_tag=3, bits=16)) is None
    assert _wav_pcm_samples(wav(bits=12, data=b"\x00" * 6)) is None
    truncated = wav(data=b"\x00" * 100)[:-60]
    assert _wav_pcm_samples(truncated) is None
    got = _wav_pcm_samples(wav(data=_s.pack("<2h", -5, 7)))
    assert got is not None and got[:3] == (8000, 1, 2)


def test_float_pcm_wav_and_aifc_decode():
    """r14 (VERDICT r13 #10): float-PCM WAV (format tag 3, 32/64-bit)
    and the AIFC compression matrix (NONE / sowt / fl32 / fl64 / ulaw /
    alaw) decode to the pinned int32 scale; unknown AIFC compression
    and malformed float widths reject with None."""
    import struct as _s

    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        _aiff_build,
        _aiff_pcm_samples,
        _alaw_expand_table,
        _float_to_int32,
        _ulaw_expand_table,
        _wav_pcm_samples,
    )

    def fwav(floats, bits=32, rate=8000, channels=1):
        pcm = b"".join(
            _s.pack("<f" if bits == 32 else "<d", v) for v in floats
        )
        fmt = b"fmt " + _s.pack(
            "<IHHIIHH", 16, 3, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        )
        body = b"WAVE" + fmt + b"data" + _s.pack("<I", len(pcm)) + pcm
        return b"RIFF" + _s.pack("<I", len(body)) + body

    # the pinned scale: rint(clip(x) * (2^31 - 1)); NaN→0, inf→full scale
    vals = [0.0, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0, float("nan"),
            float("inf"), float("-inf"), 0.25]
    for bits in (32, 64):
        got = _wav_pcm_samples(fwav(vals, bits=bits))
        assert got is not None and got[:3] == (8000, 1, len(vals))
        arr = np.frombuffer(got[3], "<i4")
        stored = np.array(vals, np.float32 if bits == 32 else np.float64)
        assert list(arr) == list(_float_to_int32(stored))
    assert arr[0] == 0 and arr[3] == 2147483647 and arr[4] == -2147483647
    assert arr[5] == 2147483647 and arr[7] == 0 and arr[8] == 2147483647

    # AIFC: every compression type round-trips against the formula
    ints = [((k * 37) % 65536) - 32768 for k in range(24)]
    f64 = [v / 32768.0 for v in ints]
    cases = [
        (b"NONE", 16, b"".join(_s.pack(">h", v) for v in ints),
         ints),
        (b"sowt", 16, b"".join(_s.pack("<h", v) for v in ints),
         ints),
        (b"fl32", 32, b"".join(_s.pack(">f", v) for v in f64),
         list(_float_to_int32(np.array(f64, np.float32)))),
        (b"fl64", 64, b"".join(_s.pack(">d", v) for v in f64),
         list(_float_to_int32(np.array(f64, np.float64)))),
        (b"ulaw", 16, bytes(k % 256 for k in range(24)),
         [int(_ulaw_expand_table()[k % 256]) for k in range(24)]),
        (b"alaw", 16, bytes(k % 256 for k in range(24)),
         [int(_alaw_expand_table()[k % 256]) for k in range(24)]),
    ]
    for comp, bits, plane, exp in cases:
        payload = _aiff_build(22050, 2, bits, plane, compression=comp)
        got = _aiff_pcm_samples(payload)
        assert got is not None, comp
        assert got[:3] == (22050, 2, 12), comp
        assert list(np.frombuffer(got[3], "<i4")) == exp, comp

    # honest rejections: unknown compression, float width mismatch
    bad = _aiff_build(8000, 1, 16, b"\x00" * 32, compression=b"ima4")
    assert _aiff_pcm_samples(bad) is None
    assert _wav_pcm_samples(fwav(vals, bits=32)[:-20]) is None


def test_audio_sample_stats_pinned_values(spark):
    """Exact integer stats: peak, floor-div DC milli-offset, integer
    isqrt RMS — all equal the independently computed formulas."""
    import math
    import struct

    from llm_training_data_pipeline_spark.operators.multimodal import (
        audio_sample_stats,
        decode_wav_samples,
        synthetic_pcm_wav_assets,
    )

    samples = decode_wav_samples(synthetic_pcm_wav_assets(spark, n=8))
    raw = {r["asset_id"]: bytes(r["samples"]) for r in samples.collect()}
    stats = {r["asset_id"]: r for r in audio_sample_stats(samples).collect()}
    assert len(stats) == 8
    for i, r in stats.items():
        vals = struct.unpack(f"<{len(raw[i]) // 4}i", raw[i])
        n = len(vals)
        assert r["n_samples"] == n
        assert r["peak_abs"] == max(abs(v) for v in vals)
        assert r["mean_milli"] == sum(vals) * 1000 // n
        assert r["rms_milli"] == math.isqrt(
            1_000_000 * sum(v * v for v in vals) // n
        )
        assert r["is_stub"] is False


def test_image_pixel_stats_pinned_values(spark):
    """Channel means and BT.601 luminance in exact milli-units equal
    the independently computed integer formula; stub flag rides
    through; real BMP pixels resize with is_stub=False preserved."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_bmp_pixels,
        image_pixel_stats,
        resize_pixels,
        synthetic_bmp_assets,
    )

    assets = synthetic_bmp_assets(spark, n=8)
    px = decode_bmp_pixels(assets)
    stats = {r["asset_id"]: r for r in image_pixel_stats(px).collect()}
    assert len(stats) == 8
    for i, r in stats.items():
        w, h = 3 + (i % 5), 2 + (i % 4)
        n = w * h
        sr = sum((x * 37 + i) % 256 for y in range(h) for x in range(w))
        sg = sum((y * 53 + i) % 256 for y in range(h) for x in range(w))
        sb = sum((x + y + i) % 256 for y in range(h) for x in range(w))
        assert r["n_pixels"] == n
        assert r["mean_r_milli"] == sr * 1000 // n
        assert r["mean_g_milli"] == sg * 1000 // n
        assert r["mean_b_milli"] == sb * 1000 // n
        assert r["luminance_milli"] == (299 * sr + 587 * sg + 114 * sb) // n
        assert r["is_stub"] is False
    resized = resize_pixels(decode_bmp_pixels(assets), 2, 2).collect()
    assert all(rr["is_stub"] is False for rr in resized)
    assert all(len(bytes(rr["pixels"])) == 2 * 2 * 3 for rr in resized)


def test_tiff_spp_bomb_guard_rejects_before_allocating():
    """r13 (ADVICE r12) — the decode-bomb guard bounds the BUFFER
    (w*h*spp), not just the pixel count: SamplesPerPixel is
    attacker-controlled up to 65535, so a crafted photometric-2 TIFF
    could otherwise expand ~64x its payload into a multi-GB plane.
    Crafted headers with spp>8 or w*h*spp past 3x the pixel ceiling
    must reject (return None) before any strip is decoded."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    img = np.zeros((4, 4, 3), np.uint8)
    base = mm._tiff_build(img, "<")
    assert mm._tiff_pixels(base) is not None

    def patch_short(buf: bytes, tag: int, value: int) -> bytes:
        b = bytearray(buf)
        at = buf.index(tag.to_bytes(2, "little"))
        b[at + 8 : at + 10] = value.to_bytes(2, "little")
        return bytes(b)

    # spp > 8 rejects outright (even though strip data is tiny)
    assert mm._tiff_pixels(patch_short(base, 277, 9)) is None
    assert mm._tiff_pixels(patch_short(base, 277, 65535)) is None
    # w*h <= pixel ceiling but w*h*spp past 3x the ceiling also rejects:
    # 16384 * 12000 = 196M <= 2^28, * 8 samples = 1.57 GB buffer target
    big = patch_short(patch_short(base, 256, 16384), 257, 12000)
    big = patch_short(big, 277, 8)
    assert mm._tiff_pixels(big) is None
    # sanity: the same dims at spp=8 stay inside the arithmetic we claim
    assert 16384 * 12000 <= mm._MAX_DECODE_PIXELS
    assert 16384 * 12000 * 8 > 3 * mm._MAX_DECODE_PIXELS


def test_jpeg_non_dividing_sampling_rejects():
    """r13 (ADVICE r12) — the chroma upsampler replicates by the
    integer factor max/c, which is only correct when each component
    factor divides the frame max. A legal-but-exotic SOF0 with luma
    3x1 / chroma 2x1 must reject honestly (None) instead of silently
    dropping the row via an undersized-plane stack error."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    img = np.random.RandomState(7).randint(0, 256, (16, 16, 3), np.uint8)
    good = mm._jpeg_build(16, 16, img.tobytes(), subsample=True)
    assert mm._jpeg_pixels(good) is not None
    # SOF0 component spec: ... [cid, (h<<4)|v, qid] x ncomp. Patch luma
    # to 3x1 and Cb to 2x1 — max_h=3, chroma ch=2, 3 % 2 != 0 — the
    # exact ADVICE scenario, caught by the divisibility guard before
    # any entropy decode is attempted.
    b = bytearray(good)
    at = bytes(b).index(b"\xff\xc0")
    # SOF0 payload: len(2) precision(1) h(2) w(2) ncomp(1) then specs
    spec0 = at + 2 + 2 + 1 + 2 + 2 + 1
    assert b[spec0] == 1 and b[spec0 + 1] == 0x22  # luma id=1, 2x2
    b[spec0 + 1] = 0x31  # luma 3x1
    assert b[spec0 + 3] == 2 and b[spec0 + 4] == 0x11  # Cb id=2, 1x1
    b[spec0 + 4] = 0x21  # Cb 2x1 — does not divide max_h=3
    assert mm._jpeg_pixels(bytes(b)) is None


def test_progressive_jpeg_matches_baseline_bit_for_bit():
    """r13 (VERDICT r12 #3) — SOF2 progressive decode, pinned the
    strongest way available: on the SAME quantized coefficients the
    progressive scan chain (DC first/refine, spectral-selection AC
    bands, successive-approximation refinement, EOB runs) must
    reconstruct pixels BIT-IDENTICAL to the already-pinned baseline
    path, across dims / gray / chroma subsampling / restart intervals /
    lossy quant tables."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(20260816)
    q_lossy = np.clip((np.arange(64).reshape(8, 8) + 1) * 2, 1, 255)
    cases = []
    for w, h in ((8, 8), (16, 16), (17, 13), (24, 16), (7, 5)):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        cases.append((w, h, img.tobytes(), dict()))
        cases.append((w, h, img.tobytes(), dict(quant=q_lossy)))
        cases.append((w, h, img[..., 0].tobytes(), dict(gray=True)))
    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    for rst in (0, 2, 3):
        cases.append(
            (24, 16, img.tobytes(), dict(subsample=True, restart=rst))
        )
        cases.append((24, 16, img.tobytes(), dict(restart=rst)))
    for w, h, samples, kw in cases:
        prog = mm._jpeg_pixels(mm._jpeg_build_progressive(w, h, samples, **kw))
        base = mm._jpeg_pixels(mm._jpeg_build(w, h, samples, **kw))
        assert prog is not None and base is not None, kw
        assert prog[:2] == base[:2] == (w, h)
        assert prog[2] == base[2], kw


def test_progressive_jpeg_decodes_within_tolerance_of_source():
    """And against the ORIGINAL pixels (not just the baseline path):
    flat-quant progressive round-trip stays within the same tolerance
    the baseline fixtures pin (DCT float rounding + color convert)."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 17, 3), np.uint8)
    w, h, rgb = mm._jpeg_pixels(
        mm._jpeg_build_progressive(17, 13, img.tobytes())
    )
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert (w, h) == (17, 13)
    assert np.abs(arr - img.astype(int)).max() <= 4
    # DC-only constant image is exact even through the scan chain
    const = np.full((16, 16, 3), 137, np.uint8)
    w, h, rgb = mm._jpeg_pixels(
        mm._jpeg_build_progressive(16, 16, const.tobytes())
    )
    assert np.array_equal(
        np.frombuffer(rgb, np.uint8).reshape(16, 16, 3), const
    )


def test_progressive_jpeg_eob_runs_and_custom_scripts():
    """EOB runs spanning many blocks (mostly-flat image: AC bands are
    all-zero across consecutive blocks, forcing EOBn with extension
    bits through the accumulation path) and non-default scan scripts:
    spectral-selection-only (no successive approximation) and a
    many-band split — all must still match the baseline path
    bit-for-bit."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    # 64x48 nearly-flat: one bright block in a sea of constant gray →
    # long EOB runs in every AC scan
    img = np.full((48, 64, 3), 90, np.uint8)
    img[20:24, 30:34] = 240
    base = mm._jpeg_pixels(mm._jpeg_build(64, 48, img.tobytes()))
    prog = mm._jpeg_pixels(mm._jpeg_build_progressive(64, 48, img.tobytes()))
    assert prog[2] == base[2]

    rng = np.random.RandomState(3)
    noisy = rng.randint(0, 256, (16, 16, 3), np.uint8)
    scripts = [
        # spectral selection only, Ah=Al=0 everywhere
        [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
         ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
        # many narrow bands
        [([0, 1, 2], 0, 0, 0, 0),
         ([0], 1, 2, 0, 0), ([0], 3, 9, 0, 0), ([0], 10, 63, 0, 0),
         ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
        # deep successive approximation on luma AC
        [([0, 1, 2], 0, 0, 0, 2), ([0, 1, 2], 0, 0, 1, 1),
         ([0, 1, 2], 0, 0, 1, 0),
         ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1),
         ([0], 1, 63, 1, 0),
         ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
    ]
    base = mm._jpeg_pixels(mm._jpeg_build(16, 16, noisy.tobytes()))
    for script in scripts:
        prog = mm._jpeg_pixels(
            mm._jpeg_build_progressive(16, 16, noisy.tobytes(), script=script)
        )
        assert prog is not None, script
        assert prog[2] == base[2], script


def test_progressive_jpeg_partial_scan_prefix_renders():
    """A progressive stream cut after complete scans (plus EOI) is a
    legal coarse render — the defining property of the format. The
    DC-only prefix must decode to the per-block DC average, and each
    added scan must stay decodable; the full chain equals baseline."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    full = mm._jpeg_build_progressive(16, 16, img.tobytes())
    # scan boundaries = positions of DHT markers following entropy data;
    # find all SOS segments and cut before the 2nd/3rd/... DHT group
    pre_cuts, cuts = [], []  # DHT positions before/after the 1st SOS
    i = 2
    n = len(full)
    scans_seen = 0
    while i + 4 <= n:  # walk top-level markers like the decoder does
        if full[i] != 0xFF:
            i += 1
            continue
        m = full[i + 1]
        if m == 0xC4:
            (cuts if scans_seen else pre_cuts).append(i)
        if m in (0xD8, 0xD9) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(full[i + 2 : i + 4], "big")
        if m == 0xDA:  # skip entropy till next real marker
            scans_seen += 1
            j = i + 2 + seg_len
            while j + 1 < n and not (
                full[j] == 0xFF
                and full[j + 1] != 0
                and not (0xD0 <= full[j + 1] <= 0xD7)
            ):
                j += 1
            i = j
        else:
            i += 2 + seg_len
    # a prefix cut before the first SOS has no scan and must reject;
    # every cut after >= 1 complete scan renders
    for c in pre_cuts:
        assert mm._jpeg_pixels(full[:c] + b"\xff\xd9") is None
    assert len(cuts) >= 4
    for c in cuts:
        got = mm._jpeg_pixels(full[:c] + b"\xff\xd9")
        assert got is not None and got[:2] == (16, 16)
    # DC-only prefix (cut right after the first scan): every 8x8 cell
    # of the render is constant (no AC energy yet)
    w, h, rgb = mm._jpeg_pixels(full[: cuts[0]] + b"\xff\xd9")
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    for by in range(2):
        for bx in range(2):
            cell = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (cell == cell[0, 0]).all()


def test_gif_disposal_compositing_renders_expected_canvases():
    """r13 (VERDICT r12 #5) — _gif_frames_rendered implements the
    GIF89a animation model: placement, transparency, disposal 0-3.
    Expected canvases are computed by an independent in-test
    compositor over the SAME stored frames, so the decoder's
    compositing is checked against the model, not against itself."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    sw, sh = 10, 8
    bg = (7, 11, 13)
    base = np.zeros((sh, sw, 3), np.uint8)
    base[..., 0] = 200  # red-ish full-screen base frame
    patch = np.zeros((3, 4, 3), np.uint8)
    patch[..., 1] = 150  # green patch
    patch[0, 0] = (1, 2, 3)  # this color is declared transparent
    patch2 = np.full((2, 2, 3), 250, np.uint8)

    frames = [base, patch, patch2, patch]
    placements = [(0, 0), (2, 1), (5, 5), (3, 4)]
    disposals = [1, 2, 3, 0]
    tcolors = [None, (1, 2, 3), None, (1, 2, 3)]
    payload = mm._gif_build_animation(
        frames,
        screen=(sw, sh),
        placements=placements,
        disposals=disposals,
        transparent_colors=tcolors,
        bg_rgb=bg,
    )

    # independent compositor over the stored frames
    canvas = np.zeros((sh, sw, 3), np.uint8)
    canvas[:] = bg
    expected = []
    for img, (lf, tp), disp, tcol in zip(
        frames, placements, disposals, tcolors
    ):
        h, w, _ = img.shape
        x0, y0 = min(lf, sw), min(tp, sh)
        x1, y1 = min(lf + w, sw), min(tp + h, sh)
        saved = canvas[y0:y1, x0:x1].copy()
        for yy in range(y1 - y0):
            for xx in range(x1 - x0):
                px = tuple(int(v) for v in img[yy, xx])
                if tcol is not None and px == tcol:
                    continue
                canvas[y0 + yy, x0 + xx] = px
        expected.append(canvas.copy())
        if disp == 2:
            canvas[y0:y1, x0:x1] = bg
        elif disp == 3:
            canvas[y0:y1, x0:x1] = saved

    got = mm._gif_frames_rendered(payload)
    assert got is not None and len(got) == 4
    for f, (w, h, rgb) in enumerate(got):
        assert (w, h) == (sw, sh)
        arr = np.frombuffer(rgb, np.uint8).reshape(sh, sw, 3)
        assert np.array_equal(arr, expected[f]), f"frame {f}"

    # stored view is untouched by the knobs: frame dims stay as stored
    stored = mm._gif_frames(payload)
    assert [(w, h) for w, h, _ in stored] == [(10, 8), (4, 3), (2, 2), (4, 3)]


def test_gif_rendered_equals_stored_for_fullscreen_opaque_frames():
    """A plain full-screen animation without transparency or offsets
    renders exactly its stored frames — and clipping: a frame hanging
    off the logical screen renders only the intersection."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    frames = [mm._cross_format_base_pixels(k)[:8, :10] for k in range(3)]
    payload = mm._gif_build_animation(frames)
    rendered = mm._gif_frames_rendered(payload)
    stored = mm._gif_frames(payload)
    assert [r[2] for r in rendered] == [s[2] for s in stored]

    # off-screen clip: 4x4 frame placed at (8, 6) on a 10x8 screen
    big = np.full((8, 10, 3), 60, np.uint8)
    hang = np.full((4, 4, 3), 220, np.uint8)
    payload = mm._gif_build_animation(
        [big, hang], screen=(10, 8), placements=[(0, 0), (8, 6)]
    )
    got = mm._gif_frames_rendered(payload)
    arr = np.frombuffer(got[1][2], np.uint8).reshape(8, 10, 3)
    assert (arr[6:, 8:] == 220).all()  # the visible 2x2 corner
    assert (arr[:6, :] == 60).all() and (arr[:, :8] == 60).all()


def test_sample_gif_frames_rendered_default_and_stored_optin(spark):
    """The Spark operator defaults to rendered frames (logical-screen
    dims on every row); rendered=False keeps stored-frame dims. Same
    row count either way — one row per stored frame."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        sample_gif_frames,
        synthetic_animated_gif_assets,
    )

    assets = synthetic_animated_gif_assets(spark, n=4)
    rend = sample_gif_frames(assets).collect()
    stor = sample_gif_frames(assets, rendered=False).collect()
    assert len(rend) == len(stor) > 0
    by_asset = {}
    for r in rend:
        by_asset.setdefault(r["asset_id"], set()).add(
            (r["width"], r["height"])
        )
    # rendered: every frame of an asset has the SAME logical-screen dims
    assert all(len(dims) == 1 for dims in by_asset.values())
    assert all(r["is_stub"] is False for r in rend)


def test_tiff_lzw_decode_inverts_encoder():
    """r13 (VERDICT r12 #7) — TIFF LZW: MSB-first packing, 9→12-bit
    codes with the EARLY-CHANGE width convention (decoder widens one
    entry before the encoder's assignment point — the lag every naive
    port gets wrong at the 511/1023/2047 boundaries), Clear/EOI, table
    wraparound via encoder Clear near 4094, and the horizontal-
    differencing predictor it usually rides with. Round-trips across
    byte orders, photometrics, strip layouts and data shapes that
    cross every width boundary."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(42)
    # raw codec: incompressible data crossing 9→10→11→12-bit widths +
    # the encoder-Clear path, and compressible KwKwK-heavy patterns
    for nbytes in (1, 200, 511, 512, 1000, 20000, 60000):
        data = bytes(rng.randint(0, 256, nbytes, np.uint8))
        assert mm._tiff_lzw_decode(mm._tiff_lzw_encode(data), nbytes) == data
    for pat in (b"ab" * 30000, bytes(range(256)) * 200, b"\x00" * 50000):
        assert mm._tiff_lzw_decode(mm._tiff_lzw_encode(pat), len(pat)) == pat

    # full container round-trips
    for bo in ("<", ">"):
        for pred in (1, 2):
            for kind, pm in (("gray", 1), ("gray0", 0), ("rgb", 2)):
                for rps in (None, 5):
                    shape = (13, 17, 3) if kind == "rgb" else (13, 17)
                    img = rng.randint(0, 256, shape, np.uint8)
                    t = mm._tiff_build(
                        img, bo, lzw=True, photometric=pm,
                        rows_per_strip=rps, predictor=pred,
                    )
                    got = mm._tiff_pixels(t)
                    assert got is not None, (bo, pred, kind, rps)
                    w, h, rgb = got
                    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
                    exp = (
                        img if kind == "rgb"
                        else np.repeat(img[..., None], 3, axis=2)
                    )
                    assert np.array_equal(arr, exp), (bo, pred, kind, rps)
    # predictor also composes with UNcompressed strips
    img = rng.randint(0, 256, (9, 11, 3), np.uint8)
    t = mm._tiff_build(img, "<", predictor=2)
    assert np.array_equal(
        np.frombuffer(mm._tiff_pixels(t)[2], np.uint8).reshape(9, 11, 3), img
    )
    # corrupt LZW (truncated mid-stream, no EOI) returns None
    t = bytearray(mm._tiff_build(img, "<", lzw=True))
    assert mm._tiff_pixels(bytes(t)[:-10]) is None
    # predictor values beyond {1, 2} reject
    t = bytearray(mm._tiff_build(img, "<", lzw=True, predictor=2))
    at = bytes(t).index((317).to_bytes(2, "little"))
    t[at + 8] = 3
    assert mm._tiff_pixels(bytes(t)) is None


def test_lzw_vectorized_matches_reference_on_corrupt_streams():
    """r14 (VERDICT r13 #5) — the vectorized LZW decoders must be
    BIT-IDENTICAL to the retired per-code reference loops, including
    the error surface: same None on the same corrupt stream, same
    (possibly truncated) bytes on the same damaged-but-decodable
    stream. Fuzz = byte mutations, truncations, and random garbage over
    valid TIFF- and GIF-LZW streams; exercises the CLEAR-mid-batch,
    KwKwK, width-boundary and max_out paths."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(1414)
    payloads = [
        bytes(rng.randint(0, 256, n, np.uint8))
        for n in (40, 600, 3000, 9000)
    ] + [b"ab" * 4000, bytes(range(256)) * 40, b"\x00" * 8000]
    for raw in payloads:
        enc_t = mm._tiff_lzw_encode(raw)
        enc_g = mm._gif_lzw_encode(raw, 8)
        cases_t = [enc_t] + [enc_t[:k] for k in (0, 1, 7, len(enc_t) // 2)]
        cases_g = [enc_g] + [enc_g[:k] for k in (0, 1, 7, len(enc_g) // 2)]
        for _ in range(40):
            b = bytearray(enc_t)
            for _m in range(rng.randint(1, 4)):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            cases_t.append(bytes(b))
            g = bytearray(enc_g)
            for _m in range(rng.randint(1, 4)):
                g[rng.randint(0, len(g))] = rng.randint(0, 256)
            cases_g.append(bytes(g))
        cases_t.append(bytes(rng.randint(0, 256, 300, np.uint8)))
        cases_g.append(bytes(rng.randint(0, 256, 300, np.uint8)))
        for c in cases_t:
            for cap in (len(raw), 17):
                assert mm._tiff_lzw_decode(c, cap) == mm._tiff_lzw_decode_ref(
                    c, cap
                ), (len(raw), cap)
        for c in cases_g:
            for mcs in (8, 4):
                for cap in (len(raw), 17, -1):
                    assert mm._gif_lzw_decode(
                        c, mcs, max_out=cap
                    ) == mm._gif_lzw_decode_ref(c, mcs, max_out=cap), (
                        len(raw), mcs, cap,
                    )


def test_png_16bit_decode_inverts_forward_encoding():
    """r13 (VERDICT r12 #7) — 16-bit PNG: byte-wise filtering with the
    depth-scaled left distance (spec 9.2), big-endian samples
    down-converted by high byte. All non-palette color types, all five
    filters; low bytes are noise on purpose so any low/high confusion
    would show; 8-bit behavior unchanged; 16-bit palette stays an
    honest None (spec: palette PNG is 8-bit-indexed only)."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(0)
    w, h = 9, 7
    for ct, nch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        hi = rng.randint(0, 256, (h, w, nch), np.uint8)
        lo = rng.randint(0, 256, (h, w, nch), np.uint8)
        px16 = np.stack([hi, lo], axis=-1).astype(np.uint8).tobytes()
        for filts in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h,
                      [0, 1, 2, 3, 4, 3, 2]):
            p = mm._png_build(w, h, ct, px16, filts, bit_depth=16)
            got = mm._png_pixels(p)
            assert got is not None, (ct, filts)
            arr = np.frombuffer(got[2], np.uint8).reshape(h, w, 3)
            if ct == 0:
                exp = np.repeat(hi, 3, axis=2)
            elif ct == 2:
                exp = hi
            elif ct == 4:
                exp = np.repeat(hi[..., :1], 3, axis=2)
            else:
                exp = hi[..., :3]
            assert np.array_equal(arr, exp), (ct, filts)
    # 16-bit palette: craft IHDR depth 16 + color type 3 → None
    hi = rng.randint(0, 4, (h, w, 1), np.uint8)
    pal = bytes(range(12))
    p8 = mm._png_build(w, h, 3, hi.tobytes(), [0] * h, palette=pal)
    assert mm._png_pixels(p8) is not None
    bad = bytearray(p8)
    at = bad.index(b"IHDR") + 4 + 8
    bad[at] = 16
    assert mm._png_pixels(bytes(bad)) is None
    # 1/2/4-bit depths still reject
    for d in (1, 2, 4):
        bad[at] = d
        assert mm._png_pixels(bytes(bad)) is None


def test_y4m_decode_inverts_forward_building():
    """r13 (VERDICT r12 #9) — the second real video path: YUV4MPEG2.
    C444 round-trips within the YCbCr float-rounding tolerance (±1),
    mono is byte-exact, C420's chroma path matches an INDEPENDENT
    in-test model (2x2 block-average then replicate-upsample through
    the same full-range matrix), corrupt/truncated/unknown-colorspace
    payloads return an honest None, and max_frames stops the walk
    early."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(5)
    img1 = rng.randint(0, 256, (16, 24, 3), np.uint8)
    img2 = rng.randint(0, 256, (16, 24, 3), np.uint8)

    fr = mm._y4m_frames(mm._y4m_build([img1, img2], "444"))
    assert [f[:2] for f in fr] == [(24, 16), (24, 16)]
    for f, src in zip(fr, (img1, img2)):
        arr = np.frombuffer(f[2], np.uint8).reshape(16, 24, 3).astype(int)
        assert np.abs(arr - src.astype(int)).max() <= 1

    g = rng.randint(0, 256, (16, 24), np.uint8)
    fr = mm._y4m_frames(mm._y4m_build([g], "mono"))
    assert np.array_equal(
        np.frombuffer(fr[0][2], np.uint8).reshape(16, 24, 3),
        np.repeat(g[..., None], 3, axis=2),
    )

    # C420: independent model of the chroma path
    fr = mm._y4m_frames(mm._y4m_build([img1], "420jpeg"))
    got = np.frombuffer(fr[0][2], np.uint8).reshape(16, 24, 3)
    rgbf = img1.astype(np.float64)
    r, gg, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    y = np.clip(np.rint(0.299 * r + 0.587 * gg + 0.114 * b), 0, 255)
    cb = 128.0 - 0.168736 * r - 0.331264 * gg + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * gg - 0.081312 * b
    exp_pl = [y]
    for p in (cb, cr):
        sub = np.clip(
            np.rint(p.reshape(8, 2, 12, 2).mean(axis=(1, 3))), 0, 255
        )
        exp_pl.append(np.repeat(np.repeat(sub, 2, axis=0), 2, axis=1))
    yy, cbu, cru = exp_pl
    exp = np.stack(
        [
            np.clip(np.rint(yy + 1.402 * (cru - 128.0)), 0, 255),
            np.clip(
                np.rint(
                    yy - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
                ), 0, 255,
            ),
            np.clip(np.rint(yy + 1.772 * (cbu - 128.0)), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    assert np.array_equal(got, exp)

    # early stop + rejection battery
    assert len(mm._y4m_frames(mm._y4m_build([img1, img2], "444"),
                              max_frames=1)) == 1
    assert mm._y4m_frames(b"nope") is None
    assert mm._y4m_frames(mm._y4m_build([img1], "444")[:-5]) is None
    assert mm._y4m_frames(
        b"YUV4MPEG2 W24 H16 C999\nFRAME\n" + bytes(24 * 16 * 3)
    ) is None
    assert mm._y4m_frames(
        b"YUV4MPEG2 W23 H16 C420jpeg\nFRAME\n" + bytes(2000)
    ) is None  # odd width under 420 is honest-rejected
    assert mm._y4m_frames(
        b"YUV4MPEG2 W65535 H65535 C444\nFRAME\n"
    ) is None  # decode-bomb guard before any allocation


def test_sample_y4m_frames_operator(spark):
    """The Spark operator: FRAME_SCHEMA rows for every-2nd frame of
    the colorspace-cycling fixture, pixel stats matching the
    cross-format pattern battery for the lossless colorspaces."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm
    from llm_training_data_pipeline_spark.operators.multimodal import (
        sample_y4m_frames,
        synthetic_y4m_assets,
    )

    assets = synthetic_y4m_assets(spark, n=8)
    rows = sample_y4m_frames(assets, every_n=2).collect()
    assert rows and all(r["is_stub"] is False for r in rows)
    assert all(r["frame_index"] % 2 == 0 for r in rows)
    # clip i has 3 + (i % 4) frames → every-2nd = 2 + (i % 4) // 2 rows
    from collections import Counter

    per = Counter(r["asset_id"] for r in rows)
    assert per == {i: (3 + i % 4 + 1) // 2 for i in range(8)}
    # mono clips (i % 4 == 3) are byte-exact vs the pattern battery
    for r in rows:
        if r["asset_id"] % 4 != 3:
            continue
        src = mm._cross_format_base_pixels(
            (r["asset_id"] + r["frame_index"]) % 6
        )[..., 0]
        exp = np.repeat(src[..., None], 3, axis=2)
        got = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(
            r["height"], r["width"], 3
        )
        assert np.array_equal(got, exp)


def test_jpeg_corrupt_sos_extra_component_returns_none():
    """r13 fuzz regression: a corrupt SOS listing a component id that
    is not in the frame (with table ids no DHT defined) must return
    None, not KeyError — the LUT prelude only builds tables for the
    FRAME's validated components."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    good = mm._jpeg_build(
        16, 16,
        np.random.RandomState(1).randint(0, 256, (16, 16, 3), np.uint8)
        .tobytes(),
    )
    at = good.index(b"\xff\xda")
    seg_len = int.from_bytes(good[at + 2 : at + 4], "big")
    ns = good[at + 4]
    bad = bytearray(good)
    # splice an extra component spec (cid 9, DC table 3 / AC table 3)
    insert_at = at + 5 + 2 * ns
    bad[insert_at:insert_at] = bytes((9, 0x33))
    bad[at + 4] = ns + 1
    bad[at + 2 : at + 4] = (seg_len + 2).to_bytes(2, "big")
    assert mm._jpeg_pixels(bytes(bad)) is None


def test_png_adam7_interlace_decode_inverts_forward_encoding():
    """r13 — Adam7 interlace: seven independently filtered sub-images
    scattered by their (start, step) lattices (spec 8.2), with empty
    passes contributing no scanlines. Round-trips across color types,
    odd/edge dims (incl. 1x1 and single-row/column where most passes
    are empty), all five filters cycling across emitted scanlines,
    8- and 16-bit, and palette."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(3)

    def nlines(w, h):
        return sum(hp for *_rest, hp in mm._adam7_passes(w, h))

    for (w, h) in ((9, 7), (8, 8), (1, 1), (2, 3), (16, 13), (5, 1), (1, 9)):
        for ct, nch in ((0, 1), (2, 3), (4, 2), (6, 4)):
            img = rng.randint(0, 256, (h, w, nch), np.uint8)
            filts = [k % 5 for k in range(nlines(w, h))]
            p = mm._png_build(w, h, ct, img.tobytes(), filts, interlace=True)
            got = mm._png_pixels(p)
            assert got is not None, (w, h, ct)
            arr = np.frombuffer(got[2], np.uint8).reshape(h, w, 3)
            exp = {
                0: np.repeat(img, 3, axis=2),
                2: img,
                4: np.repeat(img[..., :1], 3, axis=2),
                6: img[..., :3],
            }[ct]
            assert np.array_equal(arr, exp), (w, h, ct)
    # 16-bit interlaced: noisy low bytes, high byte must survive
    hi = rng.randint(0, 256, (7, 9, 3), np.uint8)
    lo = rng.randint(0, 256, (7, 9, 3), np.uint8)
    p = mm._png_build(
        9, 7, 2, np.stack([hi, lo], -1).tobytes(),
        [k % 5 for k in range(nlines(9, 7))],
        bit_depth=16, interlace=True,
    )
    assert np.array_equal(
        np.frombuffer(mm._png_pixels(p)[2], np.uint8).reshape(7, 9, 3), hi
    )
    # palette interlaced
    pi = rng.randint(0, 4, (7, 9), np.uint8)
    pal = bytes(range(12))
    p = mm._png_build(
        9, 7, 3, pi.tobytes(), [k % 5 for k in range(nlines(9, 7))],
        palette=pal, interlace=True,
    )
    exp = np.frombuffer(pal, np.uint8).reshape(4, 3)[pi]
    assert np.array_equal(
        np.frombuffer(mm._png_pixels(p)[2], np.uint8).reshape(7, 9, 3), exp
    )
    # truncated interlaced stream rejects; interlace byte 2 rejects
    full = mm._png_build(
        9, 7, 2, hi.tobytes(), [0] * nlines(9, 7), interlace=True
    )
    assert mm._png_pixels(full[:60]) is None
    bad = bytearray(full)
    bad[bad.index(b"IHDR") + 4 + 12] = 2
    assert mm._png_pixels(bytes(bad)) is None


def test_tiff_deflate_decode_inverts_forward_building():
    """r13 — TIFF compression 8 (Adobe deflate) and legacy 32946:
    bounded zlib inflate per strip, composing with both byte orders,
    the horizontal predictor and multi-strip layouts; truncated
    streams reject."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(4)
    for bo in ("<", ">"):
        for pred in (1, 2):
            for rps in (None, 5):
                img = rng.randint(0, 256, (13, 17, 3), np.uint8)
                t = mm._tiff_build(
                    img, bo, deflate=True, rows_per_strip=rps,
                    predictor=pred,
                )
                got = mm._tiff_pixels(t)
                assert got is not None, (bo, pred, rps)
                assert np.array_equal(
                    np.frombuffer(got[2], np.uint8).reshape(13, 17, 3), img
                ), (bo, pred, rps)
    # the legacy deflate tag decodes identically
    t = bytearray(mm._tiff_build(rng.randint(0, 256, (6, 8), np.uint8),
                                 "<", deflate=True))
    at = bytes(t).index((259).to_bytes(2, "little"))
    t[at + 8 : at + 10] = (32946).to_bytes(2, "little")
    assert mm._tiff_pixels(bytes(t)) is not None
    # truncated deflate strip rejects
    t2 = mm._tiff_build(rng.randint(0, 256, (13, 17, 3), np.uint8),
                        "<", deflate=True)
    assert mm._tiff_pixels(t2[:-12]) is None


def test_flac_decode_inverts_forward_encoding():
    """r13 — the audio family's first COMPRESSED codec: FLAC decode
    pinned byte-exact (lossless) against the independent forward
    encoder across subframe kinds (constant / verbatim / fixed 0-2 /
    order-1 LPC), stereo decorrelations (independent, left-side,
    right-side, mid-side), 8/16-bit, multi-frame blocking, rice
    partitions, explicit rice params, and the escape-to-raw path."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(6)

    def rt(samples, **kw):
        p = mm._flac_build(samples, **kw)
        got = mm._flac_samples(p)
        assert got is not None, kw
        rate, ch, nf, raw = got
        arr = np.frombuffer(raw, "<i4").reshape(nf, ch)
        s = np.asarray(samples)
        if s.ndim == 1:
            s = s[:, None]
        assert np.array_equal(arr, s), kw
        return p

    s = rng.randint(-30000, 30000, 700).astype(np.int64)
    for sf in ("verbatim", "fixed0", "fixed1", "fixed2", "lpc1"):
        rt(s, subframe=sf)
    rt(np.full(300, 1234))  # constant auto-detected
    rt(rng.randint(-128, 128, 500), bps=8)
    st = rng.randint(-20000, 20000, (600, 2))
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        rt(st, stereo=mode)
    rt(rng.randint(-100, 100, (300, 5)), subframe="fixed1")  # 5 channels
    rt(s[:512], partition_order=2, subframe="fixed1")
    rt(np.clip(s[:256], -200, 200), escape_raw=12, subframe="fixed0")
    rt(s[:256], rice_param=9, subframe="fixed2")
    # extreme values survive (int16 bounds; side channel uses bps+1)
    edge = np.array([[-32768, 32767], [32767, -32768], [0, -1]], np.int64)
    for mode in ("left_side", "right_side", "mid_side"):
        rt(np.vstack([edge] * 20), stereo=mode)


def test_flac_rejects_corrupt_and_is_crc_checked():
    """Bit flips anywhere in a frame flip a CRC → None (the CRCs are
    real, not decorative); truncation, bad magic, reserved codes and
    wrong-channel assignments reject; the sniffer dispatches fLaC."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(9)
    s = rng.randint(-1000, 1000, 300).astype(np.int64)
    good = mm._flac_build(s)
    assert mm._flac_samples(good) is not None
    assert mm._sniff_audio_samples(good) is not None
    assert mm._flac_samples(good[:-20]) is None
    assert mm._flac_samples(b"fLaC" + bytes(10)) is None
    assert mm._flac_samples(b"not flac") is None
    # flip one bit inside the LAST frame's audio data → CRC16 mismatch
    bad = bytearray(good)
    bad[-40] ^= 0x10
    assert mm._flac_samples(bytes(bad)) is None
    # flip a frame-header bit → CRC8 mismatch (find a sync: 0xFF 0xF8)
    at = good.index(b"\xff\xf8", 50)
    bad = bytearray(good)
    bad[at + 3] ^= 0x04
    assert mm._flac_samples(bytes(bad)) is None


def test_decode_flac_samples_operator_and_fixture(spark):
    """The Spark operator over the sweep fixture: every asset decodes
    (no omissions — the fixture is all-valid), stats match exact
    integer formulas recomputed from the same formula samples."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm
    from llm_training_data_pipeline_spark.operators.multimodal import (
        audio_sample_stats,
        decode_flac_samples,
        synthetic_flac_assets,
    )

    assets = synthetic_flac_assets(spark, n=16)
    samples = decode_flac_samples(assets)
    rows = {r["asset_id"]: r for r in samples.collect()}
    assert len(rows) == 16
    for i, r in rows.items():
        channels = 1 + (i % 2)
        bps = 8 if i % 5 == 0 else 16
        lim = 100 if bps == 8 else 20000
        n_frames = 48 + (i % 7) * 8
        exp = np.array(
            [
                [((k * 37 + c * 11 + i * 7) % (2 * lim)) - lim
                 for c in range(channels)]
                for k in range(n_frames)
            ],
            np.int64,
        )
        got = np.frombuffer(bytes(r["samples"]), "<i4").reshape(
            r["n_frames"], r["channels"]
        )
        assert r["channels"] == channels and r["n_frames"] == n_frames
        assert np.array_equal(got, exp), i
        assert r["is_stub"] is False
    stats = audio_sample_stats(samples).collect()
    assert len(stats) == 16 and all(s["n_samples"] > 0 for s in stats)


def test_pcm_24_and_32_bit_widths_decode():
    """r13 — studio sample widths: 24-bit (3-byte signed, vectorized
    sign extension, both endiannesses) and 32-bit integer PCM across
    WAV (LE), AIFF (BE) and AU (encodings 4/5). Values straddle the
    sign boundary on purpose."""
    import struct

    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    vals = [0, 1, -1, 8388607, -8388608, 123456, -123456, 42]
    # raw 24-bit packers
    le24 = b"".join(struct.pack("<i", v)[:3] for v in vals)
    be24 = b"".join(struct.pack(">i", v)[1:] for v in vals)
    assert list(mm._pcm24_to_int32(le24, "<")) == vals
    assert list(mm._pcm24_to_int32(be24, ">")) == vals

    # WAV 24-bit stereo
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 48000, 6, 24)
    data = b"data" + struct.pack("<I", len(le24)) + le24
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, nf, raw = mm._wav_pcm_samples(wav)
    assert (rate, ch, nf) == (8000, 2, 4)
    assert list(np.frombuffer(raw, "<i4")) == vals

    # WAV 32-bit mono
    v32 = [2**31 - 1, -(2**31), 7, -9]
    pcm = b"".join(struct.pack("<i", v) for v in v32)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 32000, 4, 32)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert list(
        np.frombuffer(mm._wav_pcm_samples(wav)[3], "<i4")
    ) == v32

    # AIFF 24-bit (big-endian)
    aiff = mm._aiff_build(16000, 2, 24, be24)
    rate, ch, nf, raw = mm._aiff_pcm_samples(aiff)
    assert (rate, ch, nf) == (16000, 2, 4)
    assert list(np.frombuffer(raw, "<i4")) == vals

    # AU encodings 4 (24-bit) and 5 (32-bit), big-endian
    au = mm._au_build(8000, 2, 4, be24)
    rate, ch, nf, raw = mm._au_samples(au)
    assert (rate, ch, nf) == (8000, 2, 4)
    assert list(np.frombuffer(raw, "<i4")) == vals
    pcm = b"".join(struct.pack(">i", v) for v in v32)
    au = mm._au_build(8000, 1, 5, pcm)
    assert list(np.frombuffer(mm._au_samples(au)[3], "<i4")) == v32

    # float WAV (format tag 3) DECODES as of r14 — zero floats land on
    # exact zero int32 samples (see test_float_pcm_wav_and_aifc_decode
    # for the full scale-rule battery)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
    data = b"data" + struct.pack("<I", 8) + bytes(8)
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    got = mm._wav_pcm_samples(wav)
    assert got is not None and got[3] == bytes(8)


def test_wav_ima_adpcm_decodes_and_matches_independent_model():
    """r13 — WAV format tag 0x11 (IMA/DVI ADPCM): the block decoder is
    pinned two ways. (1) EXACT: a hand-fed nibble stream must equal an
    independent in-test implementation of the IMA reference step loop
    (tables included), so the decoder matches the spec, not itself.
    (2) TOLERANCE: encode→decode of band-limited signals stays within
    the 4-bit quantizer's error envelope, mono and stereo (interleaved
    4-byte words), with frame counts padded to whole blocks."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    # --- independent model of the step loop ---
    STEPS = mm._IMA_STEP_TABLE
    IDX = mm._IMA_INDEX_TABLE

    def model(nibs, pred, index):
        out = []
        for b in nibs:
            step = STEPS[index]
            d = step >> 3
            if b & 1:
                d += step >> 2
            if b & 2:
                d += step >> 1
            if b & 4:
                d += step
            pred = pred - d if b & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + IDX[b & 7]))
            out.append(pred)
        return out

    nibs = [0, 7, 15, 8, 3, 12, 1, 14, 5, 10, 2, 9, 6, 11, 4, 13]
    got, _p, _i = mm._ima_decode_nibbles(nibs, 100, 20)
    assert got == model(nibs, 100, 20)

    # hand-build a one-block mono WAV around that nibble stream
    body = (100).to_bytes(2, "little", signed=True) + bytes((20, 0))
    body += bytes(nibs[i] | (nibs[i + 1] << 4) for i in range(0, 16, 2))
    import struct

    block_align = len(body)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 0x11, 1, 8000, 8000, block_align, 4, 2, 17
    )
    data = b"data" + struct.pack("<I", len(body)) + body
    wav_body = b"WAVE" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(wav_body)) + wav_body
    rate, ch, nf, raw = mm._wav_pcm_samples(wav)
    assert (rate, ch, nf) == (8000, 1, 17)
    assert list(np.frombuffer(raw, "<i4")) == [100] + model(nibs, 100, 20)

    # --- encode→decode tolerance, mono + stereo ---
    t = np.arange(2000)
    sig = (8000 * np.sin(t / 20) + 3000 * np.sin(t / 7)).astype(np.int64)
    for samples in (sig, np.stack(
        [sig, (6000 * np.cos(t / 15)).astype(np.int64)], axis=1
    )):
        p = mm._wav_ima_build(samples, rate=8000, block_frames=505)
        rate, ch, nf, raw = mm._wav_pcm_samples(p)
        s = samples if samples.ndim == 2 else samples[:, None]
        assert nf >= len(s) and ch == s.shape[1]
        arr = np.frombuffer(raw, "<i4").reshape(nf, ch)[: len(s)]
        err = np.abs(arr.astype(np.int64) - s)
        assert err.mean() < 150 and err.max() < 5000
        assert mm._sniff_audio_samples(p) is not None

    # corrupt: out-of-range step index / nonzero reserved byte reject
    b = bytearray(p)
    at = bytes(b).index(b"data") + 8 + 2
    b[at] = 99
    assert mm._wav_pcm_samples(bytes(b)) is None
    b[at] = 0
    b[at + 1] = 1  # reserved byte must be zero
    assert mm._wav_pcm_samples(bytes(b)) is None


def test_g711_alaw_decodes_in_wav_and_au():
    """r13 — G.711 A-law (WAV tag 6, AU encoding 27) alongside the
    existing mu-law: the expansion table is pinned against an
    independent in-test computation of the ITU G.711 segment formula,
    and canonical anchor codes get exact values; WAV tag 7 (mu-law)
    must equal the AU mu-law path byte-for-byte."""
    import struct

    import numpy as np

    from llm_training_data_pipeline_spark.operators import multimodal as mm

    t = mm._alaw_expand_table()

    # independent model of the A-law expansion
    def alaw(byte):
        a = byte ^ 0x55
        seg = (a >> 4) & 7
        mant = a & 0xF
        mag = (mant << 4) + 8 if seg == 0 else ((mant << 4) + 0x108) << (seg - 1)
        return mag if a & 0x80 else -mag

    assert list(t) == [alaw(b) for b in range(256)]
    # anchors: 0x55 is the A-law code for magnitude 8 (quiet negative),
    # 0xD5 its positive mirror; the table is odd-symmetric under ^0x80
    assert t[0x55] == -8 and t[0xD5] == 8
    assert all(int(t[b]) == -int(t[b ^ 0x80]) for b in range(256))

    codes = bytes(range(256))

    def wav(tag):
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, tag, 1, 8000, 8000, 1, 8)
        data = b"data" + struct.pack("<I", len(codes)) + codes
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rate, ch, nf, raw = mm._wav_pcm_samples(wav(6))
    assert (rate, ch, nf) == (8000, 1, 256)
    assert list(np.frombuffer(raw, "<i4")) == [alaw(b) for b in range(256)]
    # WAV mu-law (tag 7) == AU mu-law (encoding 1) on the same codes
    _r, _c, _n, raw7 = mm._wav_pcm_samples(wav(7))
    au = mm._au_build(8000, 1, 1, codes)
    assert raw7 == mm._au_samples(au)[3]
    # AU A-law (encoding 27)
    au = mm._au_build(8000, 1, 27, codes)
    rate, ch, nf, raw = mm._au_samples(au)
    assert raw == mm._wav_pcm_samples(wav(6))[3]
