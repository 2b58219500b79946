"""MIP (matrix intra prediction): spec/JAX parity, decide parity, roundtrip.

Covers the SURVEY.md §2.2 MIP line (VTM:CommonLib/MatrixIntraPrediction.cpp)
and §2.9 "MIP matmul" kernel: generated LMMSE weight matrices, boundary
downsample -> matmul -> linear upsample, transpose variant, mip_flag syntax.
"""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import decide as sdecide
from vvctpu.spec import hls, intra, sequence
from vvctpu.spec.codec import FrameDecisions




def rand_planes(h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    return [y, cb, cr]


def smooth_planes(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 2 + yy + rng.integers(0, 8, (h, w))).astype(np.int32) % 256
    cb = np.full((h // 2, w // 2), 120, np.int32)
    cr = np.full((h // 2, w // 2), 130, np.int32)
    return [y, cb, cr]


def test_mip_weights_rows_sum_64():
    for rs in (4, 8):
        w = rom.mip_weights(rs)
        assert w.shape == (rom.NUM_MIP_MODES, rs * rs, 8)
        assert (w.sum(axis=2) == 64).all()


@pytest.mark.parametrize("s", [8, 16, 32])
def test_mip_predict_jax_parity(s):
    from vvctpu.kernels import intra_pred
    rng = np.random.default_rng(42 + s)
    for trial in range(3):
        top = rng.integers(0, 256, (2 * s + 1,)).astype(np.int32)
        left = rng.integers(0, 256, (2 * s + 1,)).astype(np.int32)
        left[0] = top[0]
        for mode16 in range(2 * rom.NUM_MIP_MODES):
            ref = intra.mip_predict(top, left, mode16, s, 8)
            got = np.asarray(intra_pred.mip_predict_j(
                top, left, np.int32(mode16), s=s, bd=8))
            assert np.array_equal(ref, got), (s, mode16, trial)


def test_mip_decide_parity():
    from vvctpu.coding import decide as jdecide
    planes = smooth_planes(64, 128, seed=3)
    ref = sdecide.decide_frame(planes[0], 32, 8, mip=True)
    got = jdecide.decide_frame(planes[0], 32, 8, mip=True)
    assert ref.equal(got)


def test_mip_chosen_and_roundtrip():
    # force MIP leaves to exercise the full syntax + recon path
    planes = smooth_planes(64, 64, seed=5)
    cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False, mip=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        dec.modes8[:] = rom.NUM_LUMA_MODE + 5      # matrix 2, transpose 1
        dec.modes8[0, :] = rom.NUM_LUMA_MODE       # matrix 0
        dec.modes8[1, :] = 40                      # mix with a regular mode
        dec.split32[:] = 1
        dec.split16[:] = 1
        return dec

    data, recons, _ = sequence.encode_sequence([planes], cfg,
                                               decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.mip_enabled
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_mip_auto_roundtrip():
    # smooth content: the decision pass should be free to pick MIP; just
    # verify the end-to-end stream decodes hash-clean either way
    planes = smooth_planes(64, 128, seed=7)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False, mip=True,
                                 mts=True, lfnst=True, cclm=True)
    data, recons, _ = sequence.encode_sequence([planes], cfg)
    out, _ = sequence.decode_sequence(data)
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_mip_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    planes = smooth_planes(64, 128, seed=11)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False, mip=True,
                                 mts=True, lfnst=True)
    ref_stream, _, _ = sequence.encode_sequence([planes], cfg)
    got_stream, _, _ = jenc.encode_sequence([planes], cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for a, b in zip(out[0], ref_out[0]):
        assert np.array_equal(a, b)
