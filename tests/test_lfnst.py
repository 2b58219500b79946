"""LFNST: kernel properties, spec<->device parity, roundtrips, RD uptake."""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import sequence as seq
from vvctpu.spec import transform as st

from test_inter_parity import motion_frames


class TestKernels:
    def test_near_orthogonal(self):
        for si in range(rom.LFNST_SETS):
            for ki in range(2):
                m = rom.lfnst_matrix(si, ki).astype(np.int64)
                gram = m @ m.T
                # diagonal ~ 128^2, off-diagonal small (rounding only)
                d = np.diag(gram)
                assert np.all(np.abs(d - 128 * 128) < 900), (si, ki)
                off = gram - np.diag(d)
                assert np.abs(off).max() < 600, (si, ki)

    def test_set_mapping(self):
        assert rom.lfnst_set_for_mode(0) == (0, False)
        assert rom.lfnst_set_for_mode(1) == (0, False)
        s_lo, tr_lo = rom.lfnst_set_for_mode(10)
        s_hi, tr_hi = rom.lfnst_set_for_mode(68 - 10)
        assert (s_lo, tr_lo) == (s_hi, not tr_hi) or s_lo == s_hi
        assert not tr_lo and tr_hi

    def test_roundtrip_tight(self):
        rng = np.random.default_rng(5)
        for mode in (0, 5, 20, 30, 40, 60):
            coef = np.zeros((8, 8), np.int32)
            coef[:4, :4] = rng.integers(-500, 500, (4, 4))
            f = st.fwd_lfnst(coef, 1, mode)
            b = st.inv_lfnst(f, 1, mode)
            err = np.abs(b[:4, :4] - coef[:4, :4]).max()
            # twice-rounded 128-scale kernels: ~2% relative; far below the
            # dequant error at the QPs where LFNST is RD-selected
            assert err <= 16, (mode, err)

    def test_fwd_zeroes_high_freq(self):
        coef = np.arange(64, dtype=np.int32).reshape(8, 8)
        f = st.fwd_lfnst(coef, 1, 30)
        assert not f[4:, :].any() and not f[:, 4:].any()


class TestDeviceParity:
    def test_inv_matches_spec(self):
        pytest.importorskip("jax")
        import jax.numpy as jnp
        from vvctpu.kernels import transform as jt
        rng = np.random.default_rng(6)
        for mode in (0, 1, 7, 18, 34, 35, 50, 66):
            for k in (1, 2):
                coef = np.zeros((8, 8), np.int32)
                coef[:4, :4] = rng.integers(-3000, 3000, (4, 4))
                want = st.inv_lfnst(coef, k, mode)
                got = np.asarray(jt.inv_lfnst_j(jnp.asarray(coef), k - 1,
                                                jnp.int32(mode)))
                np.testing.assert_array_equal(got, want, err_msg=str(mode))

    def test_fwd_matches_spec(self):
        pytest.importorskip("jax")
        import jax.numpy as jnp
        from vvctpu.kernels import transform as jt
        rng = np.random.default_rng(7)
        for mode in (0, 10, 40):
            coef = np.zeros((16, 16), np.int32)
            coef[:4, :4] = rng.integers(-3000, 3000, (4, 4))
            want = st.fwd_lfnst(coef, 2, mode)
            got = np.asarray(jt.fwd_lfnst_j(jnp.asarray(coef), 1,
                                            jnp.int32(mode)))
            np.testing.assert_array_equal(got, want)


class TestStream:
    def test_ai_roundtrip_lfnst(self):
        frames = motion_frames(2, 64, 96, seed=80)
        cfg = seq.EncoderConfig(qp=37, intra_period=1, lfnst=True)
        data, recons, bits = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(2):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_lfnst_selected_and_helps(self):
        """Directional content at high QP: LFNST must actually be chosen
        for some TBs and not hurt the total RD (bits at equal recon)."""
        dec_out = []
        frames = motion_frames(1, 64, 128, seed=81)
        cfg = seq.EncoderConfig(qp=40, intra_period=1, lfnst=True, mts=True)
        seq.encode_sequence(frames, cfg, decisions_out=dec_out)
        assert (dec_out[0].lfnst8 > 0).any()

    def test_mts_plus_lfnst_roundtrip(self):
        frames = motion_frames(2, 64, 96, seed=82)
        cfg = seq.EncoderConfig(qp=32, intra_period=1, mts=True, lfnst=True)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(2):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_engines_identical_lfnst(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(3, 64, 96, seed=83)
        for mts in (False, True):
            cfg = seq.EncoderConfig(qp=34, intra_period=0, gop=1,
                                    mts=mts, lfnst=True)
            sdata, _, _ = seq.encode_sequence(frames, cfg)
            jdata, _, _ = jenc.encode_sequence(frames, cfg)
            assert jdata == sdata, f"mts={mts}"
            jout, _ = jenc.decode_sequence(sdata)
            sout, _ = seq.decode_sequence(sdata)
            for a, b in zip(jout, sout):
                for c in range(3):
                    assert np.array_equal(a[c], b[c])
