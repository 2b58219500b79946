"""CCLM chroma-from-luma: model derivation, downsampling, roundtrips,
engine parity, and RD uptake on luma-correlated chroma content."""
import numpy as np
import pytest

from vvctpu.spec import intra as sintra
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def correlated_frames(n=2, h=64, w=96, seed=50):
    """Chroma = linear function of downsampled luma -> CCLM's best case."""
    out = []
    for t, fr in enumerate(motion_frames(n, h, w, seed=seed)):
        y = fr[0]
        ds = (y[0::2, 0::2] + y[0::2, 1::2] + y[1::2, 0::2]
              + y[1::2, 1::2] + 2) >> 2
        cb = np.clip((ds >> 1) + 64, 0, 255).astype(np.int32)
        cr = np.clip(255 - (ds >> 1), 0, 255).astype(np.int32)
        out.append([y, cb, cr])
    return out


class TestModel:
    def test_alpha_beta_exact_linear(self):
        # chroma = luma/2 + 10 -> a ~ (1<<13)/2, b ~ 10
        pl = [40, 80, 120, 200]
        pc = [v // 2 + 10 for v in pl]
        a, b = sintra.cclm_alpha_beta(pl, pc, 8)
        assert abs(a - (1 << 12)) <= (1 << 12) // 16
        pred = ((a * 100) >> sintra.CCLM_SHIFT) + b
        assert abs(pred - 60) <= 2

    def test_alpha_beta_flat(self):
        a, b = sintra.cclm_alpha_beta([50, 50, 50, 50], [7, 9, 11, 13], 8)
        assert a == 0
        assert b == (((7 + 9 + 1) >> 1) + ((11 + 13 + 1) >> 1) + 1) >> 1

    def test_sort4_network_deterministic(self):
        l, c = sintra._sort4([4, 1, 3, 2], [40, 10, 30, 20])
        assert l == [1, 2, 3, 4]
        assert c == [10, 20, 30, 40]

    def test_luma_ds_uniform(self):
        y = np.full((16, 16), 100, np.int32)
        ds = sintra.luma_ds(y, 0, 0, 8, 8)
        assert (ds == 100).all()

    def test_cclm_predict_no_refs_half(self):
        y = np.full((16, 16), 77, np.int32)
        c = np.zeros((8, 8), np.int32)
        v = np.zeros((8, 8), bool)
        p = sintra.cclm_predict(y, c, v, 0, 0, 4, 8)
        assert (p == 128).all()


class TestDeviceParity:
    def test_cclm_predict_zorder_exact(self):
        """Bit-exact check along the real coding order: run the spec
        traversal-style validity (filled in Morton/Z order) and compare."""
        pytest.importorskip("jax")
        import jax.numpy as jnp
        from vvctpu.kernels import intra_pred as jip
        rng = np.random.default_rng(10)
        h, w = 64, 64
        y = rng.integers(0, 256, (h, w)).astype(np.int32)
        cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
        by = np.zeros((h + 1 + jip.MARGIN, w + 1 + jip.MARGIN), np.int32)
        by[1:h + 1, 1:w + 1] = y
        bc = np.zeros((h // 2 + 1 + jip.MARGIN, w // 2 + 1 + jip.MARGIN),
                      np.int32)
        bc[1:h // 2 + 1, 1:w // 2 + 1] = cb
        jby, jbc = jnp.asarray(by), jnp.asarray(bc)
        valid = np.zeros((h // 2, w // 2), bool)
        # walk 8x8 luma leaves (4x4 chroma) in z-order, checking each
        from vvctpu.pipeline.plan import leaf_plan
        from vvctpu.spec.codec import FrameDecisions
        dec = FrameDecisions.empty(h, w)
        dec.split32[:] = 1
        dec.split16[:] = 1
        op, xs, ys, *_ = leaf_plan(dec, h, w)
        checked = 0
        for x, yy in zip(xs, ys):
            cx, cy, cs = x // 2, yy // 2, 4
            want = sintra.cclm_predict(y, cb, valid, cx, cy, cs, 8)
            got = np.asarray(jip.cclm_predict_j(
                jby, jbc, jnp.int32(cx), jnp.int32(cy), cs=cs, frame_w=w,
                frame_h=h, n_ctu_x=1, bd=8))
            np.testing.assert_array_equal(got, want, err_msg=f"{cx},{cy}")
            valid[cy:cy + cs, cx:cx + cs] = True
            checked += 1
        assert checked == 64


class TestStream:
    def test_ai_roundtrip_cclm(self):
        frames = correlated_frames(2, 64, 96, seed=51)
        cfg = seq.EncoderConfig(qp=32, intra_period=1, cclm=True)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(2):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_cclm_selected_and_saves_bits(self):
        frames = correlated_frames(1, 64, 128, seed=52)
        dec_out = []
        cfg_on = seq.EncoderConfig(qp=32, intra_period=1, cclm=True)
        cfg_off = seq.EncoderConfig(qp=32, intra_period=1, cclm=False)
        _, _, bits_on = seq.encode_sequence(frames, cfg_on,
                                            decisions_out=dec_out)
        _, _, bits_off = seq.encode_sequence(frames, cfg_off)
        assert (dec_out[0].cmode8 > 0).any()      # CCLM actually chosen
        assert sum(bits_on) < sum(bits_off)       # and it pays for itself

    def test_engines_identical_cclm(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = correlated_frames(3, 64, 96, seed=53)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=1, cclm=True)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        jout, _ = jenc.decode_sequence(sdata)
        sout, _ = seq.decode_sequence(sdata)
        for a, b in zip(jout, sout):
            for c in range(3):
                assert np.array_equal(a[c], b[c])

    def test_engines_identical_all_tools(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = correlated_frames(3, 64, 96, seed=54)
        cfg = seq.EncoderConfig(qp=34, intra_period=0, gop=2, cclm=True,
                                mts=True, lfnst=True)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
