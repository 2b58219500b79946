"""ISP (intra sub-partitions): spec roundtrip + engine parity."""
import numpy as np
import pytest

from vvctpu.spec import sequence as sseq
from vvctpu.spec.codec import isp_parts


def synth(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (100 + 70 * np.sin((xx + 4 * t) / 9.0)
             + 50 * np.cos(yy / 7.0) + (xx // 16) * 3
             + rng.integers(-8, 8, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 20 * np.sin(xx[::2, ::2] / 6.0)).astype(np.int32)
        cr = (128 - 18 * np.cos(yy[::2, ::2] / 5.0)).astype(np.int32)
        frames.append([y, cb, cr])
    return frames


def test_isp_parts_geometry():
    assert isp_parts(8, 1) == [(0, 0, 8, 4), (0, 4, 8, 4)]
    assert isp_parts(8, 2) == [(0, 0, 4, 8), (4, 0, 4, 8)]
    assert isp_parts(16, 1) == [(0, i * 4, 16, 4) for i in range(4)]
    assert isp_parts(32, 2) == [(i * 8, 0, 8, 32) for i in range(4)]


def test_isp_spec_roundtrip():
    frames = synth(1, 64, 128, seed=3)
    cfg = sseq.EncoderConfig(qp=30, isp=True, deblock=False, sao=False,
                             rdoq=False)
    decs = []
    data, recons, _ = sseq.encode_sequence(frames, cfg, decisions_out=decs)
    assert decs[0].isp8.any(), "decision pass never chose ISP"
    out, sps = sseq.decode_sequence(data)
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_isp_with_tools_roundtrip():
    """ISP alongside MTS/LFNST/MIP/MRL/CCLM — the full intra toolset."""
    frames = synth(1, 64, 64, seed=9)
    cfg = sseq.EncoderConfig(qp=32, isp=True, mts=True, lfnst=True,
                             mip=True, mrl=True, cclm=True, jccr=True,
                             deblock=True, sao=True)
    data, recons, _ = sseq.encode_sequence(frames, cfg)
    out, sps = sseq.decode_sequence(data)
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_isp_p_frame_roundtrip():
    frames = synth(3, 64, 64, seed=5)
    cfg = sseq.EncoderConfig(qp=30, isp=True, intra_period=0, gop=1,
                             deblock=False, sao=False)
    data, recons, _ = sseq.encode_sequence(frames, cfg)
    out, sps = sseq.decode_sequence(data)
    for fo, fr in zip(out, recons):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_isp_decide_parity():
    """JAX batched decision == spec decision with ISP (bit-exact)."""
    from vvctpu.coding import decide as jdecide
    from vvctpu.spec import decide as sdecide
    frames = synth(1, 64, 128, seed=3)
    y = frames[0][0]
    d_spec = sdecide.decide_frame(y, 30, 8, mip=True, mrl=True, isp=True)
    d_jax = jdecide.decide_frame(y, 30, 8, mip=True, mrl=True, isp=True)
    assert d_spec.equal(d_jax)


def test_isp_pipeline_parity():
    """Pipeline engine streams byte-identical to spec with ISP on."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth(1, 64, 128, seed=3)
    cfg = sseq.EncoderConfig(qp=30, isp=True, mts=True, lfnst=True,
                             mip=True, mrl=True, cclm=True,
                             deblock=False, sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, recons_j, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for a, b in zip(out[0], recons_s[0]):
        assert np.array_equal(a, b)


def test_isp_pipeline_parity_b():
    """B-frame pipeline parity with ISP."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth(5, 64, 64, seed=11)
    cfg = sseq.EncoderConfig(qp=30, isp=True, intra_period=0, gop=4,
                             deblock=False, sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, _, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for fo, fr in zip(out, recons_s):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)
