"""DMVR + BDOF: decoder-side BI refinements (no syntax, both engines).

Covers SURVEY.md §2.2 DMVR (VTM:CommonLib/InterPrediction.cpp xProcessDMVR)
and BDOF (applyBiOptFlow): unit math, numpy-vs-JAX twin parity, encode/
decode roundtrip with hash verification, and spec-vs-pipeline byte parity.
"""
import numpy as np

from vvctpu.spec import inter, sequence
from vvctpu.spec.codec import FrameDecisions


def moving_planes(n, h, w, seed=0, step=1):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    big = (np.pad(big, 1, mode="edge")[:-2, :-2] + big * 6) // 7
    frames = []
    for t in range(n):
        off = t * step
        y = big[4:4 + h, off:off + w]
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = np.full((h // 2, w // 2), 130, np.int32)
        frames.append([y, cb, cr])
    return frames


def test_dmvr_offset_finds_symmetric_shift():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (96, 96)).astype(np.int32)
    m = inter.REF_MARGIN
    # ref0(x) = base(x+1), ref1(x) = base(x-1): sampling w0 at +dx and w1
    # at -dx aligns when dx = -1 (mirrored symmetric match)
    ref0 = np.pad(base[:, 1:], ((0, 0), (0, 1)), mode="edge")
    ref1 = np.pad(base[:, :-1], ((0, 0), (1, 0)), mode="edge")
    r0 = inter.pad_reference(ref0, m)
    r1 = inter.pad_reference(ref1, m)
    dx, dy = inter.dmvr_offset(r0, r1, 32, 32, 16, (0, 0), (0, 0))
    assert (dx, dy) == (-1, 0)
    # identical references: centre bias keeps the zero offset
    dx, dy = inter.dmvr_offset(r0, r0, 32, 32, 16, (0, 0), (0, 0))
    assert (dx, dy) == (0, 0)


def test_bdof_blend_identity_and_parity():
    rng = np.random.default_rng(7)
    p0e = rng.integers(0, 256, (18, 18)).astype(np.int32)
    # equal predictions -> plain rounded average (diff = 0 -> v = 0)
    out = inter.bdof_blend(p0e, p0e, 8)
    assert np.array_equal(out, p0e[1:-1, 1:-1])
    # numpy vs JAX twin bit parity on random inputs
    from vvctpu.kernels import mc as jmc
    for seed in range(5):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (18, 18)).astype(np.int32)
        b = np.clip(a + rng.integers(-9, 10, (18, 18)), 0, 255).astype(
            np.int32)
        ref = inter.bdof_blend(a, b, 8)
        got = np.asarray(jmc.bdof_blend_j(a, b, 8))
        assert np.array_equal(ref, got), f"seed {seed}"


def test_dmvr_offset_twin_parity():
    from vvctpu.kernels import mc as jmc
    m = inter.REF_MARGIN
    rng = np.random.default_rng(11)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        ref0 = rng.integers(0, 256, (64, 64)).astype(np.int32)
        ref1 = np.clip(ref0 + rng.integers(-30, 31, (64, 64)), 0,
                       255).astype(np.int32)
        r0 = inter.pad_reference(ref0, m)
        r1 = inter.pad_reference(ref1, m)
        mv0 = (rng.integers(-40, 40) * 1, rng.integers(-40, 40) * 1)
        mv1 = (rng.integers(-40, 40) * 1, rng.integers(-40, 40) * 1)
        ref = inter.dmvr_offset(r0, r1, 16, 16, 16, mv0, mv1)
        got = jmc.dmvr_offset_j(r0, r1, 16, 16, 16, mv0[0], mv0[1],
                                mv1[0], mv1[1])
        assert ref == (int(got[0]), int(got[1])), f"seed {seed}"


def test_dmvr_bdof_forced_roundtrip():
    """BI leaves with deliberately-offset MVs: DMVR+BDOF correct the
    prediction at decode exactly as at encode (hash-verified)."""
    frames = moving_planes(3, 64, 96, seed=5, step=1)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=2, dmvr=True,
                                 bdof=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc != 1:
            if poc == 2:
                dec.inter8[:] = 1
                dec.mv8[..., 0] = 2 << 4
            return dec
        dec.inter8[:] = 1
        dec.dir8[:] = 2           # BI everywhere; refs (0, 2) symmetric
        dec.mv8[..., 0] = 0       # true motion is +-1 px -> DMVR engages
        dec.mv8_l1[..., 0] = 0
        return dec

    data, recons, _ = sequence.encode_sequence(list(frames), cfg,
                                               decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.dmvr_enabled and sps.bdof_enabled
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_dmvr_bdof_improves_forced_bi():
    """With the signalled BI MVs one pel off the true symmetric motion,
    DMVR must recover most of the loss (better PSNR than without)."""
    frames = moving_planes(3, 64, 96, seed=9, step=1)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc != 1:
            if poc == 2:
                dec.inter8[:] = 1
                dec.mv8[..., 0] = 2 << 4
            return dec
        dec.inter8[:] = 1
        dec.dir8[:] = 2
        return dec

    bits = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                     intra_period=0, gop=2, dmvr=flag,
                                     bdof=flag)
        _, recons, b = sequence.encode_sequence(
            list(frames), cfg, decisions_fn=decisions_fn)
        bits[flag] = b[1]
    # refined prediction -> cheaper residual for the B picture
    assert bits[True] < bits[False]


def test_dmvr_bdof_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = moving_planes(5, 64, 128, seed=17, step=2)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=4, mmvd=True,
                                 dmvr=True, bdof=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)
