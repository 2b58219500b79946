"""MRL (multi-reference-line intra): parity, decide parity, roundtrip.

Covers the SURVEY.md §2.2 MRL line (VTM:CommonLib/IntraPrediction.cpp
initIntraPatternChType refIdx path): corner-aligned line-k references,
shifted angular ray intersection, smoothing/PDPC gated off for k > 0,
intra_luma_ref_idx TU syntax.
"""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import decide as sdecide
from vvctpu.spec import intra, sequence
from vvctpu.spec.codec import FrameDecisions


def smooth_planes(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 3 + 2 * yy + rng.integers(0, 12, (h, w))).astype(np.int32) % 256
    cb = np.full((h // 2, w // 2), 120, np.int32)
    cr = np.full((h // 2, w // 2), 130, np.int32)
    return [y, cb, cr]


@pytest.mark.parametrize("s", [8, 16, 32])
@pytest.mark.parametrize("k", [1, 2])
def test_mrl_predict_jax_parity(s, k):
    from vvctpu.kernels import intra_pred
    rng = np.random.default_rng(100 + s + k)
    plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
    valid = np.ones((64, 64), bool)
    x = y = 16
    top, left = intra.build_references(plane, valid, x, y, s, s, 8,
                                       ref_line=k)
    buf = np.zeros((64 + 1 + intra_pred.MARGIN, 64 + 1 + intra_pred.MARGIN),
                   np.int32)
    buf[1:65, 1:65] = plane
    jt, jl = intra_pred.build_references(
        np.asarray(buf), np.int32(x), np.int32(y), s=s, is_luma=True,
        frame_w=64, frame_h=64, n_ctu_x=1, bd=8, in_frame_only=True,
        ref_line=np.int32(k))
    assert np.array_equal(top, np.asarray(jt))
    assert np.array_equal(left, np.asarray(jl))
    for mode in range(rom.NUM_LUMA_MODE):
        ref = intra.predict(top, left, mode, s, s, False, 8, ref_line=k)
        got = np.asarray(intra_pred.predict(jt, jl, np.int32(mode), s=s,
                                            is_luma=True, bd=8,
                                            ref_line=np.int32(k)))
        assert np.array_equal(ref, got), (s, k, mode)


def test_mrl_line0_unchanged():
    """ref_line=0 must reproduce the pre-MRL predictor exactly."""
    rng = np.random.default_rng(9)
    plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
    valid = np.ones((64, 64), bool)
    t0, l0 = intra.build_references(plane, valid, 16, 16, 16, 16, 8)
    t1, l1 = intra.build_references(plane, valid, 16, 16, 16, 16, 8,
                                    ref_line=0)
    assert np.array_equal(t0, t1) and np.array_equal(l0, l1)


def test_mrl_decide_parity():
    from vvctpu.coding import decide as jdecide
    planes = smooth_planes(64, 128, seed=13)
    ref = sdecide.decide_frame(planes[0], 32, 8, mip=True, mrl=True)
    got = jdecide.decide_frame(planes[0], 32, 8, mip=True, mrl=True)
    assert ref.equal(got)


def test_mrl_forced_roundtrip():
    planes = smooth_planes(64, 64, seed=17)
    cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False, mrl=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        dec.modes8[:] = 40
        dec.mrl8[:] = 1
        dec.mrl8[4:, :] = 2
        dec.mrl8[:, :2] = 0
        dec.split32[:] = 1
        dec.split16[:] = 1
        return dec

    data, recons, _ = sequence.encode_sequence([planes], cfg,
                                               decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.mrl_enabled
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_mrl_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    planes = smooth_planes(64, 128, seed=19)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False, mrl=True,
                                 mip=True, mts=True, lfnst=True)
    ref_stream, _, _ = sequence.encode_sequence([planes], cfg)
    got_stream, _, _ = jenc.encode_sequence([planes], cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for a, b in zip(out[0], ref_out[0]):
        assert np.array_equal(a, b)
