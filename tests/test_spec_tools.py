"""Spec-model tool tests: transform/quant, intra prediction, residual coding."""
import numpy as np
import pytest

from vvctpu.cabac import contexts as C
from vvctpu.cabac.engine import CabacDecoder, CabacEncoder
from vvctpu.core import rom
from vvctpu.spec import intra, residual, transform


class TestTransform:
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_inverse_consistency_low_qp(self, n):
        rng = np.random.default_rng(n)
        x = rng.integers(-100, 100, (n, n)).astype(np.int32)
        c = transform.forward_transform(x)
        lev = transform.quantize(c, 1)
        xr = transform.inverse_transform(transform.dequantize(lev, 1))
        assert np.abs(xr - x).max() <= 2

    def test_dc_only(self):
        x = np.full((8, 8), 50, np.int32)
        c = transform.forward_transform(x)
        assert c[0, 0] != 0
        assert np.abs(c[1:, :]).max() == 0 and np.abs(c[0, 1:]).max() == 0

    def test_dynamic_range(self):
        x = np.full((32, 32), 255, np.int32)
        c = transform.forward_transform(x)
        assert c[0, 0] <= 32767
        x = np.full((32, 32), -255, np.int32)
        assert transform.forward_transform(x)[0, 0] >= -32768

    @pytest.mark.parametrize("qp", [0, 10, 22, 32, 45, 63])
    def test_quant_monotone(self, qp):
        c = np.arange(-2000, 2001, 250, dtype=np.int32).reshape(1, -1)
        c = np.repeat(c, 4, 0)[:, :16]
        c = np.ascontiguousarray(c[:4, :4])
        lev = transform.quantize(c, qp)
        assert (np.sign(lev) == np.sign(c) * (np.abs(lev) > 0)).all()
        dq = transform.dequantize(lev, qp)
        assert (np.sign(dq) == np.sign(lev)).all()

    def test_mts_kinds(self):
        x = np.arange(64, dtype=np.int32).reshape(8, 8) - 32
        for kh in (rom.DCT2, rom.DST7, rom.DCT8):
            for kv in (rom.DCT2, rom.DST7, rom.DCT8):
                c = transform.forward_transform(x, kh, kv)
                xr = transform.inverse_transform(c, kh, kv)
                assert np.abs(xr - x).max() <= 2


class TestIntra:
    def _refs(self, s, seed=0):
        rng = np.random.default_rng(seed)
        plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
        valid = np.ones((64, 64), bool)
        return intra.build_references(plane, valid, 16, 16, s, s), plane

    def test_reference_layout(self):
        (top, left), plane = self._refs(8)
        assert len(top) == 17 and len(left) == 17
        assert top[0] == plane[15, 15] == left[0]
        assert top[1] == plane[15, 16]
        assert left[1] == plane[16, 15]

    def test_unavailable_substitution(self):
        plane = np.full((16, 16), 77, np.int32)
        valid = np.zeros((16, 16), bool)
        top, left = intra.build_references(plane, valid, 0, 0, 8, 8)
        assert (top == 128).all() and (left == 128).all()

    @pytest.mark.parametrize("mode", list(range(0, 67, 5)) + [2, 18, 34, 50, 66])
    def test_modes_in_range(self, mode):
        (top, left), _ = self._refs(8, seed=mode)
        p = intra.predict(top, left, mode, 8, 8)
        assert p.shape == (8, 8)
        assert p.min() >= 0 and p.max() <= 255

    def test_vertical_copies_top(self):
        (top, left), _ = self._refs(16, seed=3)
        p = intra.predict(top, left, rom.VER_IDX, 16, 16)
        # away from PDPC's left-column influence the top row is copied
        assert (p[:, 8:] == np.broadcast_to(top[9:17], (16, 8))).all()

    def test_horizontal_copies_left(self):
        (top, left), _ = self._refs(16, seed=4)
        p = intra.predict(top, left, rom.HOR_IDX, 16, 16)
        assert (p[8:, :] == np.broadcast_to(left[9:17, None], (8, 16))).all()

    def test_dc_flat(self):
        top = np.full(17, 100, np.int32)
        left = np.full(17, 100, np.int32)
        p = intra.predict(top, left, rom.DC_IDX, 8, 8)
        assert (p == 100).all()

    def test_mpm_first_is_planar(self):
        for l, a in [(0, 0), (5, 5), (30, 40), (0, 60), (1, 1)]:
            lst = intra.mpm_list(l, a)
            assert lst[0] == rom.PLANAR_IDX
            assert len(lst) == rom.NUM_MPM
            assert len(set(lst)) == rom.NUM_MPM


class TestResidual:
    @pytest.mark.parametrize("log2s,chroma", [(2, False), (3, False),
                                              (4, False), (5, False),
                                              (2, True), (3, True)])
    def test_roundtrip(self, log2s, chroma):
        rng = np.random.default_rng(log2s * 2 + chroma)
        s = 1 << log2s
        for trial in range(8):
            lev = (rng.integers(-100, 100, (s, s))
                   * (rng.random((s, s)) < 0.25)).astype(np.int32)
            if not lev.any():
                lev[0, 0] = 3
            enc = CabacEncoder(C.make_ctx_state(2, 32))
            residual.code_tb(residual.EncIO(enc), lev, log2s, log2s, chroma)
            enc.terminate(1)
            dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
            out = residual.code_tb(residual.DecIO(dec), None, log2s, log2s,
                                   chroma)
            assert np.array_equal(out, lev)

    def test_single_dc(self):
        lev = np.zeros((8, 8), np.int32)
        lev[0, 0] = -1
        enc = CabacEncoder(C.make_ctx_state(2, 32))
        residual.code_tb(residual.EncIO(enc), lev, 3, 3, False)
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
        assert np.array_equal(
            residual.code_tb(residual.DecIO(dec), None, 3, 3, False), lev)

    def test_large_levels(self):
        lev = np.zeros((4, 4), np.int32)
        lev[0, 0], lev[1, 1], lev[3, 3] = 3000, -12000, 255
        enc = CabacEncoder(C.make_ctx_state(2, 32))
        residual.code_tb(residual.EncIO(enc), lev, 2, 2, False)
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
        assert np.array_equal(
            residual.code_tb(residual.DecIO(dec), None, 2, 2, False), lev)
