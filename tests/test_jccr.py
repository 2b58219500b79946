"""JCCR (joint Cb-Cr residual): RD selection, roundtrip, pipeline parity.

Covers the SURVEY.md §2.3 JCCR line (VTM:CommonLib/TrQuant.cpp joint chroma
residual): single coded TB C with resCb = C, resCr = -C (mode-2 analog,
CSign = -1), tu_joint_cbcr_flag per intra leaf, RD vs separate coding.
"""
import numpy as np

from vvctpu.spec import sequence
from vvctpu.spec.codec import FrameDecisions


def corr_chroma_planes(h, w, seed=0):
    """Content with anti-correlated chroma residuals (JCCR's sweet spot)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 2 + yy + rng.integers(0, 10, (h, w))).astype(np.int32) % 256
    base = rng.integers(-40, 41, (h // 2, w // 2)).astype(np.int32)
    cb = np.clip(128 + base, 0, 255)
    cr = np.clip(128 - base, 0, 255)
    return [y, cb, cr]


def test_jccr_selected_and_roundtrip():
    planes = corr_chroma_planes(64, 64, seed=2)
    cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False, jccr=True)
    decs = []
    data, recons, _ = sequence.encode_sequence([planes], cfg,
                                               decisions_out=decs)
    out, sps = sequence.decode_sequence(data)
    assert sps.jccr_enabled
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_jccr_with_cclm_roundtrip():
    planes = corr_chroma_planes(64, 128, seed=3)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False, jccr=True,
                                 cclm=True)
    data, recons, _ = sequence.encode_sequence([planes], cfg)
    out, _ = sequence.decode_sequence(data)
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)


def test_jccr_bits_saved_on_anticorrelated_chroma():
    planes = corr_chroma_planes(64, 64, seed=5)
    base = sequence.EncoderConfig(qp=30, sao=False, deblock=False)
    on = sequence.EncoderConfig(qp=30, sao=False, deblock=False, jccr=True)
    d0, _, b0 = sequence.encode_sequence([planes], base)
    d1, _, b1 = sequence.encode_sequence([planes], on)
    assert b1[0] < b0[0]          # joint coding must win bits here


def test_jccr_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    planes = corr_chroma_planes(64, 128, seed=7)
    for cclm in (False, True):
        cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                     jccr=True, cclm=cclm, mts=True,
                                     mip=True)
        ref_stream, _, _ = sequence.encode_sequence([planes], cfg)
        got_stream, _, _ = jenc.encode_sequence([planes], cfg)
        assert ref_stream == got_stream, f"cclm={cclm}"
        out, _ = jenc.decode_sequence(got_stream)
        ref_out, _ = sequence.decode_sequence(ref_stream)
        for a, b in zip(out[0], ref_out[0]):
            assert np.array_equal(a, b)
