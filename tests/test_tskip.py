"""Transform skip: IDT kernel parity, RD selection, roundtrip, pipeline.

Covers the SURVEY.md §2.3 "transform skip" line (VTM:CommonLib/TrQuant.cpp
xTransformSkip + transformSkip flag): here folded into the unified transform
candidate set as TU index 5 (documented TPU-first simplification).
"""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import sequence, transform as st
from vvctpu.spec.codec import FrameDecisions


def screen_planes(h, w, seed=0):
    """Sharp synthetic screen content: text-like rectangles and ramps."""
    rng = np.random.default_rng(seed)
    y = np.zeros((h, w), np.int32)
    for _ in range(30):
        x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
        y[y0:y0 + rng.integers(2, 8), x0:x0 + rng.integers(2, 8)] = \
            rng.integers(0, 256)
    cb = np.full((h // 2, w // 2), 110, np.int32)
    cr = np.full((h // 2, w // 2), 140, np.int32)
    return [y, cb, cr]


@pytest.mark.parametrize("s", [8, 16, 32])
def test_idt_roundtrip_and_parity(s):
    from vvctpu.kernels import transform as jt
    rng = np.random.default_rng(s)
    resi = rng.integers(-255, 256, (s, s)).astype(np.int32)
    c = st.forward_transform(resi, rom.IDT, rom.IDT, 8)
    r = st.inverse_transform(c, rom.IDT, rom.IDT, 8)
    assert np.array_equal(r, resi)      # lossless pre-quant roundtrip
    cj = np.asarray(jt.forward_transform(resi, s, s, rom.IDT, rom.IDT, 8))
    rj = np.asarray(jt.inverse_transform(cj, s, s, rom.IDT, rom.IDT, 8))
    assert np.array_equal(c, cj) and np.array_equal(r, rj)


def test_choose_tx_ts_parity():
    import jax.numpy as jnp
    from vvctpu.kernels import transform as jt
    rng = np.random.default_rng(3)
    for s in (8, 16):
        for trial in range(4):
            resi = rng.integers(-64, 65, (s, s)).astype(np.int32)
            resi[rng.integers(0, s), :] = 200      # sharp edge favours TS
            mk, lk, lev = st.choose_tx(resi, 30, 40, 8, mts=True,
                                       lfnst=True, rdoq=True, ts=True)
            jmk, jlk, jlev, _ = jt.choose_tx_j(
                jnp.asarray(resi), s, np.int32(30),
                np.int32(st.lambda_rd_int(30)), np.int32(40), 8,
                mts=True, lfnst=True, rdoq=True, ts=True)
            assert mk == int(jmk) and lk == int(jlk)
            assert np.array_equal(lev, np.asarray(jlev))


def test_ts_selected_on_screen_content():
    planes = screen_planes(64, 64, seed=4)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 tskip=True)
    decs = []
    data, recons, _ = sequence.encode_sequence([planes], cfg,
                                               decisions_out=decs)
    out, sps = sequence.decode_sequence(data)
    assert sps.ts_enabled
    for a, b in zip(out[0], recons[0]):
        assert np.array_equal(a, b)
    assert (decs[0].mts8 == 5).any()    # TS actually chosen somewhere


def test_ts_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    planes = screen_planes(64, 128, seed=6)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 tskip=True, mts=True, lfnst=True, mip=True)
    ref_stream, _, _ = sequence.encode_sequence([planes], cfg)
    got_stream, _, _ = jenc.encode_sequence([planes], cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for a, b in zip(out[0], ref_out[0]):
        assert np.array_equal(a, b)


def test_ts_without_mts_pipeline_roundtrip():
    """Round-4 regression: with tskip on and mts OFF, the scan's unified
    tx-index plane must still reach the writer — the plane copy was gated
    on mts_enabled alone, so the writer signalled idx 0 over TS-quantised
    levels and every decoder reconstructed garbage (ladder screen clip)."""
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    planes = screen_planes(64, 128, seed=8)
    cfg = sequence.EncoderConfig(qp=24, sao=False, deblock=False,
                                 tskip=True)
    ref_stream, ref_recons, _ = sequence.encode_sequence([planes], cfg)
    got_stream, _, _ = jenc.encode_sequence([planes], cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream, check_hash=True)
    for a, b in zip(out[0], ref_recons[0]):
        assert np.array_equal(a, b)
