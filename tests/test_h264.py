"""H.264 intra (IDR) codec pins — r13, the third real video path and
VERDICT r12's top-named decode miss. The decoder must reproduce the
independent forward encoder's reconstruction BIT-EXACTLY (all-integer
spec arithmetic, loop filter disabled), every CAVLC table must be
prefix-free with a spec-shaped Kraft sum, and everything the intra
subset cannot decode honestly must reject with None — never fake
pixels."""

import random

import numpy as np
import pytest

from llm_training_data_pipeline_spark.operators import h264


def _grad(h, w):
    xs = np.arange(w)[None, :] * 3
    ys = np.arange(h)[:, None] * 5
    base = (xs + ys) % 256
    return np.stack(
        [base, (base * 2 + 40) % 256, (base * 3 + 90) % 256], 2
    ).astype(np.uint8)


def _decode_planes(stream):
    """Decode via the plane-level internals (the strictest pin: the
    YCbCr planes themselves, before any colour conversion)."""
    nals = h264._split_nals(stream)
    sps_map, pps_map, out = {}, {}, []
    for typ, _ref, rbsp in nals:
        if typ == 7:
            sps = h264._parse_sps(rbsp)
            sps_map[sps["id"]] = sps
        elif typ == 8:
            pps = h264._parse_pps(rbsp)
            pps_map[pps["id"]] = pps
        elif typ == 5:
            got = h264._decode_idr_slice(rbsp, sps_map, pps_map)
            assert got is not None
            out.append(got)
    return out


def test_cavlc_tables_prefix_free_and_kraft_shaped():
    """Every VLC table: no duplicate codes, no code a prefix of
    another, Kraft sum <= 1 (and == 1 where the spec tree is
    complete); the intra CBP mapping is a bijection on 0..47."""
    tables = [t.values() for t in h264._COEFF_TOKEN]
    tables.append(h264._COEFF_TOKEN_CDC.values())
    tables += list(h264._TOTAL_ZEROS) + list(h264._TOTAL_ZEROS_CDC)
    tables += list(h264._RUN_BEFORE)
    for codes in tables:
        codes = sorted(codes)
        assert len(set(codes)) == len(codes)
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a), (a, b)
        kraft = sum(2.0 ** -len(c) for c in codes)
        assert kraft <= 1.0 + 1e-12
    # complete trees where the spec's are complete
    assert sum(2.0 ** -len(c) for c in h264._COEFF_TOKEN_CDC.values()) == 1.0
    for row in h264._TOTAL_ZEROS[1:]:
        assert sum(2.0 ** -len(c) for c in row) == 1.0
    # every (total_coeff, trailing_ones) combination present per context
    want = {(0, 0)} | {
        (tc, t1) for tc in range(1, 17) for t1 in range(min(3, tc) + 1)
    }
    for t in h264._COEFF_TOKEN:
        assert set(t) == want
    assert sorted(h264._CBP_INTRA) == list(range(48))


def test_cavlc_block_round_trip_every_context():
    """Deterministic battery over all five nC contexts (chroma DC,
    the three VLC contexts, the >=8 FLC), 16/15/4-coeff blocks,
    trailing-one edge cases, and the prefix 14/15/>=16 level
    escapes."""
    rng = random.Random(42)
    mags = [1, 1, 1, 2, 3, 5, 17, 200, 950, 2100, 9000]
    seen = set()
    for nc in (-1, 0, 1, 2, 3, 4, 7, 8, 20):
        max_coeff = 4 if nc == -1 else 16
        for _ in range(1500):
            coeffs = [0] * max_coeff
            for p in rng.sample(
                range(max_coeff), rng.randrange(0, max_coeff + 1)
            ):
                coeffs[p] = rng.choice(mags) * rng.choice([1, -1])
            w = h264._BitW()
            tc_enc = h264._cavlc_encode_block(w, coeffs, nc, max_coeff)
            w.rbsp_trailing()
            got, tc = h264._cavlc_decode_block(
                h264._Bits(w.getvalue()), nc, max_coeff
            )
            assert got == coeffs
            assert tc == tc_enc
            if 0 <= nc < 8:
                t1 = 0
                for _i, c in [(i, c) for i, c in enumerate(coeffs) if c][::-1]:
                    if abs(c) == 1 and t1 < 3:
                        t1 += 1
                    else:
                        break
                seen.add((0 if nc < 2 else (1 if nc < 4 else 2), tc, t1))
    # exhaustive pass: EVERY coeff_token row of every VLC context
    # (62 rows x 3 contexts), crafted directly
    for ctx, nc in ((0, 0), (1, 2), (2, 4)):
        for tc in range(17):
            for t1 in range(min(3, tc) + 1):
                coeffs = [0] * 16
                for k in range(tc):
                    coeffs[k] = 1 if k >= tc - t1 else 2
                w = h264._BitW()
                h264._cavlc_encode_block(w, coeffs, nc, 16)
                w.rbsp_trailing()
                got, _tc = h264._cavlc_decode_block(
                    h264._Bits(w.getvalue()), nc, 16
                )
                assert got == coeffs, (ctx, tc, t1)
                seen.add((ctx, tc, t1))
    assert len(seen) == 3 * 62


def test_exp_golomb_and_nal_round_trip():
    rng = random.Random(0)
    w = h264._BitW()
    vals = [rng.randrange(0, 100000) for _ in range(300)]
    svals = [rng.randrange(-5000, 5000) for _ in range(300)]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = h264._Bits(w.getvalue())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals
    # emulation prevention + NAL framing
    for _ in range(100):
        data = bytes(
            rng.choice([0, 0, 0, 1, 2, 3, 255])
            for _ in range(rng.randrange(0, 40))
        )
        assert h264._ebsp_to_rbsp(h264._rbsp_to_ebsp(data)) == data
    stream = h264._wrap_nal(7, 3, b"\x00\x00\x01\x02\x00\x00\x80") + \
        h264._wrap_nal(5, 3, bytes(range(1, 60)))
    nals = h264._split_nals(stream)
    assert [(t, r) for t, r, _ in nals] == [(7, 3), (5, 3)]
    assert nals[0][2] == b"\x00\x00\x01\x02\x00\x00\x80"
    assert nals[1][2] == bytes(range(1, 60))


def test_decode_inverts_forward_encoder_bit_exactly():
    """The core pin: across frame sizes (incl. cropped non-multiples
    of 16), QPs and content classes, the decoded YCbCr planes equal
    the encoder's reconstruction EXACTLY. The encoder's macroblock
    plan cycles I_PCM / I_16x16 (all four modes) / I_4x4 (all nine),
    so one matrix pass pins every prediction mode, both transform
    chains and all CAVLC contexts."""
    rng = np.random.RandomState(7)
    for (h, w) in [(32, 48), (34, 22), (16, 16)]:
        for qp in (10, 28, 44):
            for kind in ("grad", "noise", "checker"):
                if kind == "grad":
                    img = _grad(h, w)
                elif kind == "noise":
                    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                else:
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = (
                        np.stack([(xx // 4 + yy // 4) % 2] * 3, 2) * 255
                    ).astype(np.uint8)
                frames = [img, np.roll(img, 4, axis=1)]
                stream, recons = h264._h264_build(
                    frames, qp=qp, return_recon=True
                )
                decoded = _decode_planes(stream)
                assert len(decoded) == 2
                for (y, cb, cr, sps), (ry, rcb, rcr) in zip(decoded, recons):
                    assert np.array_equal(y[:h, :w], ry), (h, w, qp, kind)
                    assert np.array_equal(cb[: h // 2, : w // 2], rcb)
                    assert np.array_equal(cr[: h // 2, : w // 2], rcr)
                    assert (sps["width"], sps["height"]) == (w, h)


def test_deblocking_filter_pins_bit_exactly():
    """r13 second wave: the in-loop filter (8.7). Filtered streams
    decode to the encoder's FILTERED reconstruction bit-exactly,
    across QPs and nonzero slice alpha/beta offsets; the filter
    demonstrably changes the output (so the pin is not vacuous); a
    PPS without deblocking_filter_control (filter implicitly on,
    offsets 0) also decodes."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (34, 22, 3)).astype(np.uint8)
    base_unfiltered = None
    for qp in (16, 30, 42):
        for offs in ((0, 0), (2, -1), (-3, 3)):
            stream, recons = h264._h264_build(
                [img], qp=qp, return_recon=True, deblock=True,
                deblock_offsets=offs,
            )
            (y, cb, cr, _sps), = _decode_planes(stream)
            ry, rcb, rcr = recons[0]
            assert np.array_equal(y[:34, :22], ry), (qp, offs)
            assert np.array_equal(cb[:17, :11], rcb), (qp, offs)
            assert np.array_equal(cr[:17, :11], rcr), (qp, offs)
    _s0, r0 = h264._h264_build([img], qp=35, return_recon=True)
    _s1, r1 = h264._h264_build([img], qp=35, return_recon=True, deblock=True)
    assert not np.array_equal(r0[0][0], r1[0][0])
    # PPS with deblocking_filter_control_present_flag == 0: the slice
    # header carries no idc/offsets and the filter is implicitly ON —
    # must decode to the same planes as the explicit idc=0 variant
    stream, recons = h264._h264_build(
        [img], qp=30, return_recon=True, deblock=True
    )
    implicit, recons2 = h264._h264_build(
        [img], qp=30, return_recon=True, deblock=True,
        pps_deblock_ctrl=False,
    )
    assert np.array_equal(recons[0][0], recons2[0][0])
    (y, cb, cr, _sps), = _decode_planes(implicit)
    assert np.array_equal(y[:34, :22], recons[0][0])
    assert np.array_equal(cb[:17, :11], recons[0][1])


def test_multi_slice_pictures_pin_bit_exactly():
    """r13 third wave: pictures spanning multiple I-slices. Slice
    independence is normative — prediction, CAVLC contexts and the
    intra-4x4 mode predictor must not cross slice boundaries — so a
    2-slice encode of the same frame DIFFERS from the 1-slice encode,
    yet each decodes bit-exactly to its own encoder reconstruction;
    idc 2 (filter on, slice boundaries unfiltered) differs from idc 0
    and pins exactly; slice gaps reject; the MP4 mux packs all slices
    of a picture into ONE sample."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    outs = {}
    for n_sl in (1, 2, 3, 9):
        stream, recons = h264._h264_build(
            [img, np.roll(img, 4, 1)], qp=30, return_recon=True,
            deblock=True, slices=n_sl,
        )
        nals = h264._split_nals(stream)
        sps = h264._parse_sps(nals[0][2])
        pps = h264._parse_pps(nals[1][2])
        slice_rbsps = [rb for t, _r, rb in nals if t == 5]
        assert len(slice_rbsps) == 2 * n_sl
        for fi in range(2):
            got = h264._decode_idr_picture(
                slice_rbsps[fi * n_sl : (fi + 1) * n_sl], {0: sps}, {0: pps}
            )
            assert got is not None, n_sl
            y, cb, cr, _sps = got
            assert np.array_equal(y[:48, :48], recons[fi][0]), n_sl
            assert np.array_equal(cb[:24, :24], recons[fi][1]), n_sl
        outs[n_sl] = h264._h264_frames(stream)[0][3]
        if n_sl > 1:
            # a picture missing its tail slice rejects (not covered)
            assert h264._decode_idr_picture(
                slice_rbsps[:n_sl - 1], {0: sps}, {0: pps}
            ) is None
            assert h264._decode_idr_picture(
                slice_rbsps[1:n_sl], {0: sps}, {0: pps}
            ) is None  # first slice must start at MB 0
    # boundary independence is observable: outputs differ by slicing
    assert outs[1] != outs[3]
    # idc 2 leaves slice-boundary edges unfiltered — differs from idc 0
    s0 = h264._h264_frames(
        h264._h264_build([img], qp=32, deblock=True, slices=3)
    )[0][3]
    s2, r2 = h264._h264_build(
        [img], qp=32, return_recon=True, deblock=True, slices=3, idc2=True
    )
    fr2 = h264._h264_frames(s2)
    assert fr2[0][3] != s0
    nals = h264._split_nals(s2)
    sps = h264._parse_sps(nals[0][2])
    pps = h264._parse_pps(nals[1][2])
    y, cb, cr, _ = h264._decode_idr_picture(
        [rb for t, _r, rb in nals if t == 5], {0: sps}, {0: pps}
    )
    assert np.array_equal(y[:48, :48], r2[0][0])
    # MP4: multi-slice pictures = one sample each, identical pixels
    mp4 = h264._mp4_avc_build(
        [img, img[::-1].copy()], qp=26, deblock=True, slices=3
    )
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _mp4_frame_count,
    )

    assert _mp4_frame_count(mp4) == 2
    ann = h264._h264_frames(
        h264._h264_build([img, img[::-1].copy()], qp=26, deblock=True,
                         slices=3)
    )
    assert h264._mp4_h264_frames(mp4) == ann
    # fuzz the multi-slice parse paths
    base = h264._h264_build([img], qp=30, deblock=True, slices=3, idc2=True)
    rnd = random.Random(6)
    for _ in range(1200):
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
            b[i:i] = bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(1, 8))
            )
        out = h264._h264_frames(bytes(b))
        if out is not None:
            for _i, w, h, px in out:
                assert len(px) == w * h * 3


def test_frame_api_crop_every_n_and_max_frames():
    """_h264_frames returns display-size RGB honoring the SPS crop;
    every_n decodes only the selected IDRs (identical pixels to the
    full decode's selection); max_frames stops early."""
    imgs = [_grad(34, 50), _grad(34, 50)[::-1].copy(),
            np.roll(_grad(34, 50), 7, 1), _grad(34, 50)[:, ::-1].copy()]
    s = h264._h264_build(imgs, qp=22)
    full = h264._h264_frames(s)
    assert [i for i, *_ in full] == [0, 1, 2, 3]
    assert all((w, h) == (50, 34) for _, w, h, _px in full)
    assert all(len(px) == 50 * 34 * 3 for *_c, px in full)
    sampled = h264._h264_frames(s, every_n=3)
    assert [i for i, *_ in sampled] == [0, 3]
    assert sampled[0][3] == full[0][3] and sampled[1][3] == full[3][3]
    assert len(h264._h264_frames(s, max_frames=1)) == 1


def test_honest_rejections():
    """Everything outside the intra subset returns None: active
    deblocking, CABAC, FMO, P slices, High-profile SPS, multi-slice
    pictures, and oversized dimensions (the decode-bomb guard)."""
    img = _grad(16, 16)
    good = h264._h264_build([img], qp=30)
    assert h264._h264_frames(good) is not None
    nals = h264._split_nals(good)
    sps_rbsp = nals[0][2]
    pps_rbsp = nals[1][2]
    sl_rbsp = nals[2][2]

    def rebuild(sps=None, pps=None, sl=None):
        return (
            h264._wrap_nal(7, 3, sps if sps is not None else sps_rbsp)
            + h264._wrap_nal(8, 3, pps if pps is not None else pps_rbsp)
            + h264._wrap_nal(5, 3, sl if sl is not None else sl_rbsp)
        )

    # High-profile SPS (profile_idc 100)
    assert h264._h264_frames(rebuild(sps=b"\x64" + sps_rbsp[1:])) is None
    # CABAC: PPS with entropy_coding_mode_flag flipped. The encoder's
    # PPS begins ue(0) ue(0) u(1): bits 1,1,0... -> flipping bit 2 sets
    # the CABAC flag.
    b = bytearray(pps_rbsp)
    b[0] ^= 0x20
    assert h264._h264_frames(rebuild(pps=bytes(b))) is None
    # P slice: slice_type ue(0) instead of ue(7). Slice starts
    # ue(0)=1, ue(7)=0001000 -> replace the leading byte pattern.
    w = h264._BitW()
    w.ue(0)
    w.ue(0)  # slice_type P
    pslice = w.out + sl_rbsp[1:]
    assert h264._h264_frames(rebuild(sl=bytes(pslice) + b"\x80")) is None
    # multi-slice: first_mb_in_slice != 0
    w = h264._BitW()
    w.ue(1)
    multi = w.out + sl_rbsp[1:]
    assert h264._h264_frames(rebuild(sl=bytes(multi) + b"\x80")) is None
    # non-IDR slice NAL in the stream
    assert h264._h264_frames(good + h264._wrap_nal(1, 2, b"\x88\x80")) is None
    # decode bomb: SPS claiming 9999x9999 MBs rejects before allocating
    w = h264._BitW()
    w.u(66, 8); w.u(0xC0, 8); w.u(30, 8)
    w.ue(0); w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
    w.ue(9999); w.ue(9999); w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    assert h264._h264_frames(h264._wrap_nal(7, 3, w.getvalue())) is None
    # not a NAL stream at all
    assert h264._h264_frames(b"") is None
    assert h264._h264_frames(b"YUV4MPEG2 junk") is None


def test_decoder_never_raises_on_corrupt_input():
    """Deterministic slice of the 60k-trial fuzz run: bit flips,
    truncations, garbage insertion and stream splices over valid
    streams must return None or valid frames — never raise."""
    rng = np.random.RandomState(3)
    valids = [
        h264._h264_build([rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)],
                         qp=q)
        for q in (12, 30, 44)
    ]
    rnd = random.Random(1)
    for v in valids:
        for _ in range(700):
            b = bytearray(v)
            op = rnd.randrange(4)
            if op == 0:
                for _ in range(rnd.randrange(1, 4)):
                    i = rnd.randrange(len(b))
                    b[i] ^= 1 << rnd.randrange(8)
            elif op == 1:
                b = b[: rnd.randrange(1, len(b))]
            elif op == 2:
                i = rnd.randrange(len(b))
                b[i:i] = bytes(
                    rnd.randrange(256) for _ in range(rnd.randrange(1, 8))
                )
            else:
                other = valids[rnd.randrange(len(valids))]
                b = b[: rnd.randrange(len(b))] + other[rnd.randrange(len(other)):]
            out = h264._h264_frames(bytes(b))
            if out is not None:
                for _i, w, h, px in out:
                    assert len(px) == w * h * 3


def test_mp4_avc_demux_matches_annexb_path():
    """H.264-in-MP4 (r13): the isom/avc1 mux round-trips — demuxed
    samples decode to pixels IDENTICAL to the Annex B path over the
    same frames; every_n walks the sample table without decoding
    skipped samples; the existing _mp4_meta/_mp4_frame_count parsers
    read the muxed file (cross-validation of both sides)."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _mp4_frame_count,
        _mp4_meta,
    )

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (34, 50, 3)).astype(np.uint8)
            for _ in range(4)]
    mp4 = h264._mp4_avc_build(imgs, qp=26, deblock=True)
    assert _mp4_meta(mp4)[0] == "isom"
    assert _mp4_frame_count(mp4) == 4
    fr = h264._mp4_h264_frames(mp4)
    ann = h264._h264_frames(h264._h264_build(imgs, qp=26, deblock=True))
    assert fr is not None and len(fr) == 4
    for a, b in zip(fr, ann):
        assert a == b
    sampled = h264._mp4_h264_frames(mp4, every_n=3)
    assert [i for i, *_ in sampled] == [0, 3]
    assert sampled[1][3] == fr[3][3]
    # honest rejections: truncated mdat, non-MP4, corrupt avcC
    assert h264._mp4_h264_frames(mp4[: len(mp4) // 2]) is None
    assert h264._mp4_h264_frames(b"not an mp4") is None
    at = mp4.index(b"avcC")
    bad = bytearray(mp4)
    bad[at + 8] ^= 0xFF  # corrupt the SPS inside avcC
    assert h264._mp4_h264_frames(bytes(bad)) is None
    # fuzz slice over the container path
    rnd = random.Random(4)
    for _ in range(600):
        b = bytearray(mp4)
        op = rnd.randrange(3)
        if op == 0:
            for _ in range(rnd.randrange(1, 4)):
                i = rnd.randrange(len(b))
                b[i] ^= 1 << rnd.randrange(8)
        elif op == 1:
            b = b[: rnd.randrange(1, len(b))]
        else:
            i = rnd.randrange(len(b))
            b[i:i] = bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(1, 8))
            )
        out = h264._mp4_h264_frames(bytes(b))
        if out is not None:
            for _i, w, h, px in out:
                assert len(px) == w * h * 3


def test_video_meta_reports_avc_codec_and_dims(spark):
    """decode_video_meta's r13 stsd walk: muxed avc1 clips report
    codec='avc1' with the sample-entry dims; header-only stub MP4s
    (no stbl) keep NULL codec fields."""
    import pyspark.sql.functions as F

    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_video_meta,
        synthetic_mp4_avc_assets,
        synthetic_video_assets,
    )

    assets = synthetic_video_assets(spark, 4).unionByName(
        synthetic_mp4_avc_assets(spark, n=3).withColumn(
            "asset_id", F.col("asset_id") + 100
        )
    )
    rows = {r["asset_id"]: r for r in decode_video_meta(assets).collect()}
    for i in range(4):
        assert rows[i]["codec"] is None and rows[i]["track_width"] is None
    for i in (100, 101, 102):
        assert rows[i]["codec"] == "avc1"
        assert (rows[i]["track_width"], rows[i]["track_height"]) == (48, 32)


def test_sample_mp4_frames_spark_surface(spark):
    """The REAL MP4 path through mapInPandas: avc1-intra clips decode
    (is_stub false), a non-AVC MP4 and a corrupt payload are omitted
    (the stub path remains their honest contract)."""
    import pyspark.sql.functions as F

    from llm_training_data_pipeline_spark.operators.multimodal import (
        sample_mp4_frames,
        synthetic_mp4_avc_assets,
        synthetic_video_assets,
    )

    assets = synthetic_mp4_avc_assets(spark, n=4)
    stub_mp4s = synthetic_video_assets(spark, n=2).withColumn(
        "asset_id", F.col("asset_id") + 100
    )
    rows = sample_mp4_frames(
        assets.unionByName(stub_mp4s), every_n=2
    ).collect()
    assert rows and all(r["asset_id"] < 100 for r in rows)
    assert all(not r["is_stub"] for r in rows)
    expect = sum((2 + (i % 3) + 1) // 2 for i in range(4))
    assert len(rows) == expect
    assert all(
        len(r["pixels"]) == r["width"] * r["height"] * 3 for r in rows
    )


def test_frame_decode_paths_have_no_shuffle(spark):
    """100-TB shape pin: the H.264/MP4 decode operators are a single
    projection + mapInPandas — no Exchange anywhere in the physical
    plan (decode parallelism == partition count; pixels never cross
    the wire)."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        sample_h264_frames,
        sample_mp4_frames,
        synthetic_h264_assets,
    )

    assets = synthetic_h264_assets(spark, n=2)
    for op in (sample_h264_frames, sample_mp4_frames):
        plan = op(assets)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (op.__name__, plan)


def test_sample_h264_frames_spark_surface(spark):
    """FRAME_SCHEMA contract through mapInPandas: every clip of the
    fixture decodes (is_stub false), every_n sampling keeps indices
    0, n, 2n..., and a corrupt payload row is omitted, not fatal."""
    import pyspark.sql.functions as F

    from llm_training_data_pipeline_spark.operators.multimodal import (
        sample_h264_frames,
        synthetic_h264_assets,
    )
    from llm_training_data_pipeline_spark.schemas import MULTIMODAL_SCHEMA

    assets = synthetic_h264_assets(spark, n=6)
    corrupt = spark.createDataFrame(
        [(99, "video", b"\x00\x00\x00\x01garbage", "video/h264", {})],
        MULTIMODAL_SCHEMA,
    )
    frames = sample_h264_frames(assets.unionByName(corrupt), every_n=2)
    rows = frames.collect()
    assert rows and all(r["asset_id"] != 99 for r in rows)
    assert all(r["frame_index"] % 2 == 0 for r in rows)
    assert all(r["is_stub"] is False for r in rows)
    assert all(
        len(r["pixels"]) == r["width"] * r["height"] * 3 for r in rows
    )
    # 6 clips with 2 + (i % 3) frames, every 2nd kept
    expect = sum((2 + (i % 3) + 1) // 2 for i in range(6))
    assert len(rows) == expect


# ---------------------------------------------------------------------------
# P slices (r14, VERDICT r13 #7)
# ---------------------------------------------------------------------------


def _decode_gop_planes(stream):
    """Decode a GOP stream at plane level, threading the reference."""
    nals = h264._split_nals(stream)
    sps_map, pps_map, pics = {}, {}, []
    for typ, _ref, rbsp in nals:
        if typ == 7:
            sps = h264._parse_sps(rbsp)
            sps_map[sps["id"]] = sps
        elif typ == 8:
            pps = h264._parse_pps(rbsp)
            pps_map[pps["id"]] = pps
        elif typ in (1, 5):
            if h264._Bits(rbsp).ue() == 0:
                pics.append((typ == 5, [rbsp]))
            else:
                pics[-1][1].append(rbsp)
    out, ref = [], None
    for is_idr, slices in pics:
        got = h264._decode_picture(slices, sps_map, pps_map, is_idr, ref)
        assert got is not None
        y, cb, cr, sps = got
        ref = (y, cb, cr)
        out.append(got)
    return out


def _gop_frames(dims, n=6, seed=11):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (*dims, 3)).astype(np.uint8)
    return [
        np.clip(
            np.roll(base, (i, 2 * i), axis=(0, 1)).astype(np.int32)
            + rng.randint(-5, 6, (*dims, 3)),
            0, 255,
        ).astype(np.uint8)
        for i in range(n)
    ]


@pytest.mark.parametrize("dims", [(48, 64), (32, 48), (18, 34)])
@pytest.mark.parametrize("kw", [
    dict(gop=6, qp=30),
    dict(gop=6, qp=20, deblock=True),
    dict(gop=3, qp=35, deblock=True, deblock_offsets=(2, -1)),
    dict(gop=6, qp=28, slices=3),
    dict(gop=6, qp=28, slices=2, deblock=True, idc2=True),
    dict(gop=6, qp=24, chroma_qp_offset=3, deblock=True),
])
def test_p_gop_matrix_bit_exact(dims, kw):
    """The r14 inter pin: IDR + P GOPs across dims, QPs, deblocking
    (inter bS segments), multi-slice and idc2 — the decoder must
    reproduce the forward encoder's reconstruction BIT-EXACTLY. The
    encoder plan cycles P_Skip / zero-MV / all 16 quarter-pel
    fractional positions / out-of-frame MVs / 16x8 / 8x16 /
    intra-in-P / qp-delta macroblocks."""
    frames = _gop_frames(dims)
    payload, recons = h264._h264_build(frames, return_recon=True, **kw)
    pics = _decode_gop_planes(payload)
    assert len(pics) == len(frames)
    for i, (y, cb, cr, _sps) in enumerate(pics):
        ey, ecb, ecr = recons[i]
        hh, ww = ey.shape
        assert np.array_equal(y[:hh, :ww], ey), (dims, kw, i)
        assert np.array_equal(cb[: hh // 2, : ww // 2], ecb), (dims, kw, i)
        assert np.array_equal(cr[: hh // 2, : ww // 2], ecr), (dims, kw, i)


def test_mc_luma_matches_naive_spec_reimplementation():
    """Independent verification of the quarter-pel interpolator: a
    straight per-pixel transcription of 8.4.2.2.1 (6-tap halves,
    unclipped intermediates for j, average quarters, edge clamping)
    must equal the vectorized _mc_luma at every fractional position,
    including reads beyond the picture edge."""
    rng = np.random.RandomState(5)
    ref = rng.randint(0, 256, (24, 28)).astype(np.uint8)

    def px(x, y):
        return int(ref[min(max(y, 0), 23), min(max(x, 0), 27)])

    def clip1(v):
        return min(255, max(0, v))

    def t6(a):
        return a[0] - 5 * a[1] + 20 * a[2] + 20 * a[3] - 5 * a[4] + a[5]

    def bh1(x, y):  # unclipped horizontal half intermediate
        return t6([px(x + k, y) for k in range(-2, 4)])

    def hv1(x, y):  # unclipped vertical half intermediate
        return t6([px(x, y + k) for k in range(-2, 4)])

    def naive(x0, y0, w, h, mvx, mvy):
        ix, iy, fx, fy = mvx >> 2, mvy >> 2, mvx & 3, mvy & 3
        out = np.zeros((h, w), np.int64)
        for dy in range(h):
            for dx in range(w):
                X, Y = x0 + ix + dx, y0 + iy + dy
                g = px(X, Y)
                b = clip1((bh1(X, Y) + 16) >> 5)
                hh = clip1((hv1(X, Y) + 16) >> 5)
                m = clip1((hv1(X + 1, Y) + 16) >> 5)
                s = clip1((bh1(X, Y + 1) + 16) >> 5)
                j = clip1(
                    (t6([bh1(X, Y + k) for k in range(-2, 4)]) + 512) >> 10
                )
                H, M = px(X + 1, Y), px(X, Y + 1)
                av = lambda a, b2: (a + b2 + 1) >> 1  # noqa: E731
                table = {
                    (0, 0): g, (1, 0): av(g, b), (2, 0): b,
                    (3, 0): av(b, H), (0, 1): av(g, hh),
                    (1, 1): av(b, hh), (2, 1): av(b, j),
                    (3, 1): av(b, m), (0, 2): hh, (1, 2): av(hh, j),
                    (2, 2): j, (3, 2): av(j, m), (0, 3): av(hh, M),
                    (1, 3): av(hh, s), (2, 3): av(j, s), (3, 3): av(m, s),
                }
                out[dy, dx] = table[(fx, fy)]
        return out

    for fy in range(4):
        for fx in range(4):
            for (x0, y0, mvi_x, mvi_y) in ((4, 4, 8, 4), (0, 0, -12, -8),
                                           (20, 16, 24, 20)):
                mvx, mvy = mvi_x + fx, mvi_y + fy
                got = h264._mc_luma(ref, x0, y0, 8, 8, mvx, mvy)
                exp = naive(x0, y0, 8, 8, mvx, mvy)
                assert np.array_equal(got, exp), (fx, fy, x0, y0)


def test_mc_chroma_matches_naive_bilinear():
    rng = np.random.RandomState(9)
    ref = rng.randint(0, 256, (12, 14)).astype(np.uint8)

    def px(x, y):
        return int(ref[min(max(y, 0), 11), min(max(x, 0), 13)])

    for mvx in (-9, -3, 0, 5, 13, 40):
        for mvy in (-7, 0, 6, 11, 33):
            got = h264._mc_chroma(ref, 4, 4, 4, 4, mvx, mvy)
            ix, iy, dx, dy = mvx >> 3, mvy >> 3, mvx & 7, mvy & 7
            exp = np.zeros((4, 4), np.int64)
            for r in range(4):
                for c in range(4):
                    X, Y = 4 + ix + c, 4 + iy + r
                    exp[r, c] = (
                        (8 - dx) * (8 - dy) * px(X, Y)
                        + dx * (8 - dy) * px(X + 1, Y)
                        + (8 - dx) * dy * px(X, Y + 1)
                        + dx * dy * px(X + 1, Y + 1) + 32
                    ) >> 6
            assert np.array_equal(got, exp), (mvx, mvy)


def test_mv_predictor_rules():
    """8.4.1.3 predictor corners on hand-built neighbour states."""
    mvx = np.zeros((8, 12), np.int32)
    mvy = np.zeros((8, 12), np.int32)
    ref = np.full((8, 12), -1, np.int8)
    sl = np.zeros((2, 3), np.int32)  # all MBs in slice 0

    # median: A=(4,0) B=(0,8) C=(8,4) -> (4,4)
    for (by, bx), (x, y) in (((4, 3), (4, 0)), ((3, 4), (0, 8)),
                             ((3, 8), (8, 4))):
        mvx[by, bx], mvy[by, bx], ref[by, bx] = x, y, 0
    assert h264._mvp_median(mvx, mvy, ref, sl, 0, 4, 4, 4) == (4, 4)

    # exactly one neighbour shares ref 0 -> its MV wins over median
    ref[3, 4] = -1  # B intra
    ref[3, 8] = -1  # C intra
    assert h264._mvp_median(mvx, mvy, ref, sl, 0, 4, 4, 4) == (4, 0)

    # A-only rule: B/C/D address-unavailable (top row) -> mvA verbatim
    mvx2 = np.zeros((8, 12), np.int32); mvy2 = np.zeros((8, 12), np.int32)
    ref2 = np.full((8, 12), -1, np.int8)
    mvx2[0, 3], mvy2[0, 3], ref2[0, 3] = 7, -9, 0
    assert h264._mvp_median(mvx2, mvy2, ref2, sl, 0, 0, 4, 4) == (7, -9)

    # skip inference: zero-MV neighbour forces zero
    mvx3 = np.zeros((8, 12), np.int32); mvy3 = np.zeros((8, 12), np.int32)
    ref3 = np.full((8, 12), -1, np.int8)
    ref3[4, 3] = 0  # A inter, zero MV
    mvx3[3, 4], mvy3[3, 4], ref3[3, 4] = 12, 4, 0  # B inter, nonzero
    assert h264._skip_mv(mvx3, mvy3, ref3, sl, 0, 4, 4) == (0, 0)
    # unavailable above neighbour forces zero too
    assert h264._skip_mv(mvx3, mvy3, ref3, sl, 0, 0, 4) == (0, 0)

    # 16x8 directional: top partition takes B when B has ref 0
    mvx4 = np.zeros((8, 12), np.int32); mvy4 = np.zeros((8, 12), np.int32)
    ref4 = np.full((8, 12), -1, np.int8)
    mvx4[3, 4], mvy4[3, 4], ref4[3, 4] = 20, -8, 0  # B of the top part
    mvx4[6, 3], mvy4[6, 3], ref4[6, 3] = 2, 2, 0    # A of the bottom part
    got = h264._mvp_for_partition(mvx4, mvy4, ref4, sl, 0, 4, 4, "16x8_top")
    assert got == (20, -8)
    got = h264._mvp_for_partition(mvx4, mvy4, ref4, sl, 0, 6, 4,
                                  "16x8_bottom")
    assert got == (2, 2)  # bottom takes A


def test_cbp_inter_table_is_permutation_with_anchors():
    t = h264._CBP_INTER
    assert sorted(t) == list(range(48))
    # well-known anchors of Table 9-4's Inter column
    assert t[0] == 0 and t[1] == 16 and t[2] == 1
    assert t[6] == 32 and t[11] == 15 and t[12] == 47


def test_p_rejections_are_honest():
    """Out-of-scope inter shapes must reject with None, never fake
    pixels: P_8x8 macroblocks, MMCO marking, reference-list
    modification, weighted prediction, and P pictures with no decoded
    reference."""
    sps = h264._parse_sps(h264._write_sps(3, 2, (0, 0, 0, 0)))
    pps = h264._parse_pps(h264._write_pps(28, 0))
    sps_map, pps_map = {sps["id"]: sps}, {pps["id"]: pps}
    ref = (np.zeros((32, 48), np.uint8), np.zeros((16, 24), np.uint8),
           np.zeros((16, 24), np.uint8))

    def p_header(w):
        w.ue(0)   # first_mb
        w.ue(5)   # slice_type P
        w.ue(0)   # pps id
        w.u(0, 4)  # frame_num
        w.u(0, 1)  # num_ref_idx_active_override
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
        w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
        w.se(0)   # slice_qp_delta
        w.ue(1)   # disable_deblocking_filter_idc

    # P_8x8 decodes as of the sub-partition extension — but an
    # out-of-range sub_mb_type rejects
    w = h264._BitW()
    p_header(w)
    w.ue(0)  # skip_run
    w.ue(3)  # P_8x8
    w.ue(4)  # sub_mb_type 4: invalid
    w.ue(0); w.ue(0); w.ue(0)
    w.rbsp_trailing()
    assert h264._decode_picture(
        [w.getvalue()], sps_map, pps_map, False, ref) is None

    # MMCO (adaptive marking) rejects
    w = h264._BitW()
    w.ue(0); w.ue(5); w.ue(0); w.u(0, 4)
    w.u(0, 1); w.u(0, 1)
    w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag = 1
    w.rbsp_trailing()
    assert h264._parse_slice_header(
        w.getvalue(), sps_map, pps_map, False) is None

    # list modification rejects
    w = h264._BitW()
    w.ue(0); w.ue(5); w.ue(0); w.u(0, 4)
    w.u(0, 1)
    w.u(1, 1)  # ref_pic_list_modification_flag_l0 = 1
    w.rbsp_trailing()
    assert h264._parse_slice_header(
        w.getvalue(), sps_map, pps_map, False) is None

    # weighted prediction (PPS flag) rejects at the P header
    w = h264._BitW()
    w.ue(1); w.ue(0)  # pps id 1, sps id 0
    w.u(0, 1); w.u(0, 1); w.ue(0); w.ue(0); w.ue(0)
    w.u(1, 1)  # weighted_pred_flag = 1
    w.u(0, 2)
    w.se(28 - 26); w.se(0); w.se(0)
    w.u(1, 1); w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    wpps = h264._parse_pps(w.getvalue())
    assert wpps is not None and wpps["weighted_pred"] == 1
    pm2 = dict(pps_map); pm2[1] = wpps
    w = h264._BitW()
    w.ue(0); w.ue(5); w.ue(1); w.u(0, 4)
    w.rbsp_trailing()
    assert h264._parse_slice_header(
        w.getvalue(), sps_map, pm2, False) is None

    # P picture with no reference rejects
    w = h264._BitW()
    p_header(w)
    w.ue(1)  # one skipped MB then end
    w.rbsp_trailing()
    assert h264._decode_picture(
        [w.getvalue()], sps_map, pps_map, False, None) is None

    # a stream OPENING with a non-IDR slice rejects end to end
    frames = _gop_frames((32, 48), n=3)
    payload = h264._h264_build(frames, gop=3)
    nals = h264._split_nals(payload)
    keep = bytearray()
    for typ, ridc, rbsp in nals:
        if typ == 5:
            continue  # drop the IDR picture
        keep += h264._wrap_nal(typ, ridc, rbsp)
    assert h264._h264_frames(bytes(keep)) is None


def test_deblock_inter_bs_semantics():
    """Independent check of the inter bS rules (8.7.2.1) on crafted
    state: equal-MV no-residual inter edges must stay untouched
    (bS 0), a >= 1-pel MV difference filters (bS 1), non-zero
    coefficients filter stronger (bS 2), and an intra MB edge keeps
    the historic bS 4 behaviour."""
    def make_planes():
        # smooth step across the MB edge at x=16: inside every
        # activity threshold, so any bS > 0 WILL modify samples
        y = np.full((16, 32), 100, np.uint8)
        y[:, 16:] = 104
        cb = np.full((8, 16), 90, np.uint8)
        cb[:, 8:] = 94
        cr = cb.copy()
        return y, cb, cr

    def run(mvq=(0, 0), tc_q=0, intra_q=False):
        y, cb, cr = make_planes()
        mb_qp = np.full((1, 2), 30, np.int16)
        mb_pcm = np.zeros((1, 2), bool)
        mb_idc = np.zeros((1, 2), np.int16)
        mb_slice = np.zeros((1, 2), np.int32)
        zero = np.zeros((1, 2), np.int16)
        mb_intra = np.array([[False, intra_q]])
        luma_tc = np.zeros((4, 8), np.int16)
        luma_tc[:, 4] = tc_q
        mv_x = np.zeros((4, 8), np.int32)
        mv_y = np.zeros((4, 8), np.int32)
        mv_x[:, 4:], mv_y[:, 4:] = mvq
        blk_ref = np.zeros((4, 8), np.int8)
        if intra_q:
            blk_ref[:, 4:] = -1
        h264._deblock_picture(
            y, cb, cr, mb_qp, mb_pcm, mb_idc, mb_slice, zero, zero, 0,
            mb_intra=mb_intra, luma_tc=luma_tc, mv_x=mv_x, mv_y=mv_y,
            blk_ref=blk_ref,
        )
        return y

    raw = make_planes()[0]
    base = run()  # same MV, no coeffs -> MB edge at x=16 must be bS 0
    assert np.array_equal(base[:, 12:20], raw[:, 12:20])

    moved = run(mvq=(4, 0))  # 1-pel x difference -> bS 1 filters
    assert not np.array_equal(moved[:, 12:20], raw[:, 12:20])

    coeffs = run(tc_q=2)  # non-zero coefficients -> bS 2 filters
    assert not np.array_equal(coeffs[:, 12:20], raw[:, 12:20])

    intra = run(intra_q=True)  # intra MB edge -> bS 4 filters
    assert not np.array_equal(intra[:, 12:20], raw[:, 12:20])
    # bS 4 touches more taps than bS 1 (the strong filter)
    assert not np.array_equal(intra[:, 12:20], moved[:, 12:20])


def test_mp4_p_gop_and_inter_sampling():
    """MP4 avc1 carriage of an IDR+P GOP decodes identically to the
    Annex B stream, and every_n sampling with inter frames present
    still returns the correct (reference-threaded) pixels."""
    frames = _gop_frames((32, 48), n=4, seed=3)
    mp4 = h264._mp4_avc_build(frames, qp=26, gop=4, deblock=True)
    annexb = h264._h264_build(frames, qp=26, gop=4, deblock=True)
    got = h264._mp4_h264_frames(mp4)
    g2 = h264._h264_frames(annexb)
    assert got is not None and g2 is not None
    assert [g[3] for g in got] == [g[3] for g in g2]
    g3 = h264._h264_frames(annexb, every_n=2)
    assert [g[0] for g in g3] == [0, 2]
    assert g3[1][3] == g2[2][3]
    g4 = h264._mp4_h264_frames(mp4, every_n=2, max_frames=2)
    assert [g[0] for g in g4] == [0, 2] and g4[1][3] == g2[2][3]
