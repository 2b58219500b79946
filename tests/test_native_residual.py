"""Native residual binarizer/parser == numpy/python reference."""
import numpy as np
import pytest

from vvctpu.cabac import binarize, contexts as C, native as cn
from vvctpu.cabac.engine import CabacEncoder

pytestmark = pytest.mark.skipif(not cn.available(),
                                reason="native lib not built")


def _random_tb(rng, lg, dens):
    s = 1 << lg
    lev = (rng.integers(-300, 300, (s, s))
           * (rng.random((s, s)) < dens)).astype(np.int32)
    if not lev.any():
        lev[0, 0] = 5
    return lev


class TestNativeResidual:
    def test_tb_bins_matches_numpy(self):
        rng = np.random.default_rng(8)
        for trial in range(45):
            lg = int(rng.integers(2, 6))
            lev = _random_tb(rng, lg, [0.05, 0.3, 0.9][trial % 3])
            chroma = bool(rng.integers(0, 2))
            sink = binarize.BinSink()
            binarize.tb_bins(sink, lev, lg, lg, chroma)
            got = cn.tb_bins_c(lev, lg, lg, chroma)
            assert np.array_equal(got, sink.concat()), (trial, lg, chroma)

    def test_tb_parse_roundtrip(self):
        rng = np.random.default_rng(9)
        for trial in range(30):
            lg = int(rng.integers(2, 6))
            lev = _random_tb(rng, lg, 0.4)
            chroma = bool(rng.integers(0, 2))
            arr = cn.tb_bins_c(lev, lg, lg, chroma)
            term = np.array([[2, 0, 1]], np.int32)
            data = cn.pack_bins(np.concatenate([arr, term]), 2, 32)
            nd = cn.NativeDecoder(C.make_ctx_state(2, 32), data)
            out = cn.native_parse_tb(nd, lg, lg, chroma)
            assert nd.terminate() == 1
            assert np.array_equal(out, lev), (trial, lg)

    def test_wpp_snapshot_packer_matches_python(self):
        rng = np.random.default_rng(10)
        arr = np.zeros((4000, 3), np.int32)
        arr[:, 0] = rng.integers(0, 2, len(arr))
        arr[:, 1] = rng.integers(0, C.NUM_CTX, len(arr))
        arr[:, 2] = rng.integers(0, 2, len(arr))
        arr[-1] = [2, 0, 1]
        st1 = C.make_ctx_state(2, 30)
        nat, snap_n = cn.pack_bins_state(arr, st1, 1000)
        st2 = C.make_ctx_state(2, 30)
        enc = CabacEncoder(st2)
        snap_p = None
        for i, (k, c, b) in enumerate(arr):
            (enc.bin(int(c), int(b)) if k == 0
             else enc.bypass(int(b)) if k == 1 else enc.terminate(int(b)))
            if i + 1 == 1000:
                snap_p = (st2.p0.copy(), st2.p1.copy())
        assert nat == enc.finish()
        assert np.array_equal(snap_n[0], snap_p[0])
        assert np.array_equal(snap_n[1], snap_p[1])
