"""SAO tests: categoriser, decision improves distortion, syntax roundtrip,
loop closure through the full codec."""
import numpy as np
import pytest

from vvctpu.cabac import contexts as C
from vvctpu.cabac.engine import CabacDecoder, CabacEncoder
from vvctpu.spec import sao
from vvctpu.spec.residual import DecIO, EncIO

from test_codec_roundtrip import synth_frame


class TestEdgeCategories:
    def test_valley_peak(self):
        p = np.array([[5, 1, 5],
                      [5, 1, 5],
                      [5, 1, 5]], np.int64)
        cat = sao._edge_categories(p, sao.SAO_EO0)
        assert cat[1, 1] == 0          # deep valley
        p2 = np.array([[1, 9, 1]] * 3, np.int64)
        assert sao._edge_categories(p2, sao.SAO_EO0)[1, 1] == 4  # peak


class TestDecision:
    def test_reduces_distortion(self):
        rng = np.random.default_rng(5)
        orig = [rng.integers(0, 256, (64, 64)).astype(np.int32),
                rng.integers(0, 256, (32, 32)).astype(np.int32),
                rng.integers(0, 256, (32, 32)).astype(np.int32)]
        # rec = orig + structured banding error
        rec = [np.clip(o + ((o >> 3) % 4) - 2, 0, 255).astype(np.int32)
               for o in orig]
        params = sao.decide_sao(orig, rec, qp=32)
        out = sao.apply_sao(rec, params)
        for c in range(3):
            d0 = ((orig[c] - rec[c]).astype(np.int64) ** 2).sum()
            d1 = ((orig[c] - out[c]).astype(np.int64) ** 2).sum()
            assert d1 <= d0

    def test_perfect_recon_stays_off(self):
        orig = [np.full((64, 64), 100, np.int32),
                np.full((32, 32), 50, np.int32),
                np.full((32, 32), 60, np.int32)]
        params = sao.decide_sao(orig, [o.copy() for o in orig], qp=32)
        assert (params.type == sao.SAO_OFF).all()


class TestSyntax:
    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        n_y, n_x = 2, 3
        p = sao.SaoParams.empty(n_y, n_x)
        p.type[:] = rng.integers(0, 6, p.type.shape)
        p.offsets[:] = rng.integers(0, sao.MAX_OFFSET + 1, p.offsets.shape)
        band = p.type == sao.SAO_BAND
        # band offsets signed
        sign = rng.integers(0, 2, p.offsets.shape) * -2 + 1
        p.offsets[:] = np.where(band[..., None], p.offsets * sign, p.offsets)
        p.band_pos[:] = np.where(band, rng.integers(0, 32, p.type.shape), 0)
        enc = CabacEncoder(C.make_ctx_state(2, 32))
        sao.code_sao_params(EncIO(enc), p, n_y, n_x)
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
        q = sao.code_sao_params(DecIO(dec), None, n_y, n_x)
        assert dec.terminate() == 1
        assert np.array_equal(q.type, p.type)
        coded = p.type != sao.SAO_OFF
        assert np.array_equal(q.offsets[coded], p.offsets[coded])
        bandmask = p.type == sao.SAO_BAND
        assert np.array_equal(q.band_pos[bandmask], p.band_pos[bandmask])


class TestLoopClosure:
    def test_roundtrip_spec(self):
        from vvctpu.spec import sequence as seq
        planes = synth_frame(64, 96, seed=21)
        data, recons, _ = seq.encode_sequence([planes],
                                              seq.EncoderConfig(qp=32))
        frames, _ = seq.decode_sequence(data, check_hash=True)
        for c in range(3):
            assert np.array_equal(frames[0][c], recons[0][c])

    def test_sao_improves_or_matches_psnr(self):
        from vvctpu.spec import sequence as seq
        planes = synth_frame(64, 96, seed=22)
        d_on, r_on, b_on = seq.encode_sequence(
            [planes], seq.EncoderConfig(qp=37, sao=True))
        d_off, r_off, b_off = seq.encode_sequence(
            [planes], seq.EncoderConfig(qp=37, sao=False))
        p_on = seq.psnr(planes[0], r_on[0][0])
        p_off = seq.psnr(planes[0], r_off[0][0])
        assert p_on >= p_off - 0.01
