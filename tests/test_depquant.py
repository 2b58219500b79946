"""Dependent quantization (SURVEY §2.3 DepQuant): 4-state trellis encoder,
state-dependent dequant, device twins, end-to-end both engines."""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import transform as st
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def rand_coef(h, w, seed, scale=600):
    rng = np.random.default_rng(seed)
    c = rng.normal(0, scale, (h, w)) / (1 + np.arange(w)[None, :]
                                        + np.arange(h)[:, None])
    return np.clip(np.round(c), -32000, 32000).astype(np.int32)


def test_state_walk_matches_transitions():
    lev = np.zeros((4, 4), np.int32)
    lev[0, 0] = 3   # DC: parity 1
    lev[1, 0] = 2   # parity 0
    states = st.dq_states(lev)
    scan = rom.scan_order(2, 2)
    # walk from the highest scan position: all-zero tail keeps/updates
    # states via parity-0 transitions; recompute by hand
    s = 0
    for k in range(len(scan) - 1, -1, -1):
        x, y = int(scan[k][0]), int(scan[k][1])
        assert states[y, x] == s
        s = st.DQ_TRANS[s][int(lev[y, x]) & 1]


@pytest.mark.parametrize("hw", [(4, 4), (8, 8), (16, 16), (32, 32), (4, 8)])
def test_trellis_beats_or_matches_scalar_distortion(hw):
    h, w = hw
    qp = 32
    coef = rand_coef(h, w, seed=h * 100 + w)
    lam = st.lambda_rd_int(qp)
    lev = st.quantize_dq(coef, qp, lam)
    rec = st.dequantize_dq(lev, qp)
    lev_s = st.quantize(coef, qp)
    rec_s = st.dequantize(lev_s, qp)
    d_dq = ((coef.astype(np.int64) - rec) ** 2).sum()
    d_sc = ((coef.astype(np.int64) - rec_s) ** 2).sum()
    r_dq = st.level_rate_est(lev)
    r_sc = st.level_rate_est(lev_s)
    # trellis optimises D + lambda*R: its lagrangian must not lose
    assert d_dq + lam * r_dq <= (d_sc + lam * r_sc) * 1.05
    # signs survive the roundtrip
    assert np.all(np.sign(lev) == np.sign(lev) * 1)


@pytest.mark.parametrize("hw", [(4, 4), (8, 8), (16, 16), (32, 32), (8, 4)])
def test_device_twins_bit_identical(hw):
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from vvctpu.kernels import transform as kt
    h, w = hw
    qp = 27
    lam = st.lambda_rd_int(qp)
    coef = rand_coef(h, w, seed=7 * h + w)
    lev = st.quantize_dq(coef, qp, lam)
    # states + dequant twins
    assert np.array_equal(np.asarray(kt.dq_states_j(jnp.asarray(lev), h, w)),
                          st.dq_states(lev))
    assert np.array_equal(
        np.asarray(kt.dequantize_dq_j(jnp.asarray(lev), h, w, qp)),
        st.dequantize_dq(lev, qp))
    # trellis twin
    lev_j = np.asarray(kt.quantize_dq_j(jnp.asarray(coef), h, w, qp, lam))
    assert np.array_equal(lev_j, lev)


def test_roundtrip_spec_ai_and_inter():
    frames = motion_frames(3, 64, 64, seed=50)
    for kw in (dict(qp=32, dq=True),
               dict(qp=30, dq=True, intra_period=0, gop=2, sbt=True,
                    jccr=True, cclm=True)):
        cfg = seq.EncoderConfig(**kw)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, sps = seq.decode_sequence(data, check_hash=True)
        assert sps.dq_enabled
        for poc in range(3):
            for c in range(3):
                assert np.array_equal(out[poc][c], recons[poc][c])


def test_engines_byte_identical_with_dq():
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(3, 64, 64, seed=51)
    for kw in (dict(qp=32, dq=True, mts=True, lfnst=True),
               dict(qp=32, dq=True, intra_period=0, gop=2, sbt=True,
                    ciip=True, lmcs=True)):
        cfg = seq.EncoderConfig(**kw)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        seq.decode_sequence(sdata, check_hash=True)
