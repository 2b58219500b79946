"""Bit-exactness of the JAX engine against the spec model (SURVEY.md §4.2)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vvctpu.core import rom  # noqa: E402
from vvctpu.kernels import intra_pred as jintra  # noqa: E402
from vvctpu.spec import intra as sintra  # noqa: E402


def _refs(s, seed):
    rng = np.random.default_rng(seed)
    top = rng.integers(0, 256, 2 * s + 1).astype(np.int32)
    left = rng.integers(0, 256, 2 * s + 1).astype(np.int32)
    left[0] = top[0]
    return top, left


class TestIntraParity:
    @pytest.mark.parametrize("s", [4, 8, 16, 32])
    def test_all_modes_luma(self, s):
        top, left = _refs(s, s)
        for mode in range(rom.NUM_LUMA_MODE):
            ref = sintra.predict(top, left, mode, s, s, False)
            got = np.asarray(jintra.predict(jnp.asarray(top),
                                            jnp.asarray(left), mode,
                                            s=s, is_luma=True))
            assert np.array_equal(got, ref), f"mode {mode} size {s}"

    @pytest.mark.parametrize("s", [4, 8, 16])
    def test_all_modes_chroma(self, s):
        top, left = _refs(s, 100 + s)
        for mode in range(rom.NUM_LUMA_MODE):
            ref = sintra.predict(top, left, mode, s, s, True)
            got = np.asarray(jintra.predict(jnp.asarray(top),
                                            jnp.asarray(left), mode,
                                            s=s, is_luma=False))
            assert np.array_equal(got, ref), f"chroma mode {mode} size {s}"


class TestReferenceParity:
    def _frame_state(self, w, h, seed):
        rng = np.random.default_rng(seed)
        plane = rng.integers(0, 256, (h, w)).astype(np.int32)
        return plane

    @pytest.mark.parametrize("x,y,s", [(0, 0, 8), (8, 0, 8), (0, 8, 8),
                                       (56, 56, 8), (32, 0, 32), (0, 32, 16),
                                       (120, 64, 8), (64, 64, 32)])
    def test_refs_match_spec_valid_map(self, x, y, s):
        """Geometric (Morton) availability == spec dynamic valid map."""
        w = h = 128
        n_ctu_x = w // 64
        plane = self._frame_state(w, h, x + y + s)
        # spec valid map: everything strictly before (x, y) in coding order
        valid = np.zeros((h, w), bool)
        cur = None
        for cy in range(0, h, 64):
            for cx in range(0, w, 64):
                for gy in range(8):
                    for gx in range(8):
                        m = 0
                        for b in range(3):
                            m |= ((gx >> b) & 1) << (2 * b)
                            m |= ((gy >> b) & 1) << (2 * b + 1)
                        px, py = cx + gx * 8, cy + gy * 8
                        order = (cy // 64 * n_ctu_x + cx // 64) * 64 + m
                        if cur is None and px == x and py == y:
                            cur = order
        # mark granules with order < cur as valid
        for cy in range(0, h, 64):
            for cx in range(0, w, 64):
                for gy in range(8):
                    for gx in range(8):
                        m = 0
                        for b in range(3):
                            m |= ((gx >> b) & 1) << (2 * b)
                            m |= ((gy >> b) & 1) << (2 * b + 1)
                        order = (cy // 64 * n_ctu_x + cx // 64) * 64 + m
                        if order < cur:
                            valid[cy + gy * 8:cy + gy * 8 + 8,
                                  cx + gx * 8:cx + gx * 8 + 8] = True
        ref_top, ref_left = sintra.build_references(plane, valid, x, y, s, s)

        buf = np.zeros((h + 1 + jintra.MARGIN, w + 1 + jintra.MARGIN),
                       np.int32)
        buf[1:h + 1, 1:w + 1] = plane
        top, left = jintra.build_references(
            jnp.asarray(buf), x, y, s=s, is_luma=True, frame_w=w, frame_h=h,
            n_ctu_x=n_ctu_x)
        assert np.array_equal(np.asarray(top), ref_top)
        assert np.array_equal(np.asarray(left), ref_left)


class TestTransformParity:
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_fwd_inv_quant_parity(self, n):
        from vvctpu.kernels import transform as jtf
        from vvctpu.spec import transform as stf
        rng = np.random.default_rng(n)
        x = rng.integers(-255, 256, (n, n)).astype(np.int32)
        for kh in (rom.DCT2, rom.DST7, rom.DCT8):
            for kv in (rom.DCT2, rom.DST7, rom.DCT8):
                c_ref = stf.forward_transform(x, kh, kv)
                c_jax = np.asarray(jtf.forward_transform(
                    jnp.asarray(x), n, n, kh, kv))
                assert np.array_equal(c_jax, c_ref), (n, kh, kv)
                for qp in (0, 22, 37, 51, 63):
                    l_ref = stf.quantize(c_ref, qp)
                    l_jax = np.asarray(jtf.quantize(jnp.asarray(c_ref),
                                                    n, n, qp))
                    assert np.array_equal(l_jax, l_ref), (n, qp)
                    d_ref = stf.dequantize(l_ref, qp)
                    d_jax = np.asarray(jtf.dequantize(jnp.asarray(l_ref),
                                                      n, n, qp))
                    assert np.array_equal(d_jax, d_ref), (n, qp)
                x_ref = stf.inverse_transform(c_ref, kh, kv)
                x_jax = np.asarray(jtf.inverse_transform(
                    jnp.asarray(c_ref), n, n, kh, kv))
                assert np.array_equal(x_jax, x_ref), (n, kh, kv)
