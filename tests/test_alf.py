"""ALF: derivation improves PSNR, syntax roundtrip, engine parity."""
import numpy as np
import pytest

from vvctpu.cabac import contexts as C
from vvctpu.cabac.engine import CabacDecoder, CabacEncoder
from vvctpu.spec import alf, sequence as seq
from vvctpu.spec.residual import DecIO, EncIO

from test_codec_roundtrip import synth_frame


class TestAlfCore:
    def test_wiener_improves(self):
        rng = np.random.default_rng(3)
        orig = synth_frame(128, 128, seed=101)[0]
        rec = np.clip(orig + rng.integers(-6, 7, orig.shape), 0,
                      255).astype(np.int32)
        p = alf.derive_alf(orig, rec, qp=37)
        if p.enabled:
            out = alf.apply_alf(rec, p)
            e0 = ((orig - rec) ** 2).sum()
            e1 = ((orig - out) ** 2).sum()
            assert e1 <= e0

    def test_perfect_recon_disabled(self):
        orig = synth_frame(64, 64, seed=102)[0]
        p = alf.derive_alf(orig, orig.copy(), qp=32)
        assert not p.enabled

    def test_classify_shapes_and_ranges(self):
        rec = synth_frame(64, 128, seed=104)[0]
        cls, tr = alf.classify(rec)
        assert cls.shape == (16, 32) and tr.shape == (16, 32)
        assert cls.min() >= 0 and cls.max() < alf.N_CLASSES
        assert tr.min() >= 0 and tr.max() < 4

    def test_transpose_perms_are_permutations(self):
        for t in range(4):
            assert sorted(alf.TRANS_PERMS[t]) == list(range(alf.N_COEFF))
        assert (alf.TRANS_PERMS[0] == np.arange(alf.N_COEFF)).all()

    def test_syntax_roundtrip(self):
        rng = np.random.default_rng(5)
        present = rng.integers(0, 2, alf.N_CLASSES).astype(np.uint8)
        present[0] = 1
        coeff = rng.integers(-200, 200,
                             (alf.N_CLASSES, alf.N_COEFF)).astype(np.int32)
        coeff *= present[:, None]
        p = alf.AlfParams(enabled=True, coeff=coeff, present=present,
                          ctu_on=rng.integers(0, 2, (2, 3)).astype(np.uint8))
        enc = CabacEncoder(C.make_ctx_state(2, 32))
        alf.code_alf_params(EncIO(enc), p, 2, 3)
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
        q = alf.code_alf_params(DecIO(dec), None, 2, 3)
        assert dec.terminate() == 1
        assert q.equal(p)


class TestChromaAlf:
    def test_frame_derive_apply_improves_chroma(self):
        rng = np.random.default_rng(7)
        planes = synth_frame(128, 128, seed=105)
        rec = [np.clip(p + rng.integers(-6, 7, p.shape), 0,
                       255).astype(np.int32) for p in planes]
        params = alf.derive_alf_frame(planes, rec, qp=40)
        out = alf.apply_alf_frame(rec, params, 64, 8)
        for c in (1, 2):
            e0 = ((planes[c] - rec[c]) ** 2).sum()
            e1 = ((planes[c] - out[c]) ** 2).sum()
            assert e1 <= e0

    def test_syntax_roundtrip_with_chroma(self):
        rng = np.random.default_rng(8)
        present = np.zeros(alf.N_CLASSES, np.uint8)
        present[3] = 1
        coeff = np.zeros((alf.N_CLASSES, alf.N_COEFF), np.int32)
        coeff[3] = rng.integers(-100, 100, alf.N_COEFF)
        p = alf.AlfParams(
            enabled=True, coeff=coeff, present=present,
            ctu_on=rng.integers(0, 2, (2, 2)).astype(np.uint8),
            c_enabled=np.array([1, 0], np.uint8),
            c_coeff=np.stack([rng.integers(-50, 50, alf.N_COEFF_C),
                              np.zeros(alf.N_COEFF_C)]).astype(np.int32),
            cc_present=np.array([1, 0], np.uint8),
            cc_coeff=np.stack([rng.integers(-20, 20, alf.N_COEFF_CC),
                               np.zeros(alf.N_COEFF_CC)]).astype(np.int32),
            ctu_on_c=np.stack([rng.integers(0, 2, (2, 2)),
                               np.zeros((2, 2))]).astype(np.uint8))
        enc = CabacEncoder(C.make_ctx_state(2, 32))
        alf.code_alf_params(EncIO(enc), p, 2, 2)
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(2, 32), enc.finish())
        q = alf.code_alf_params(DecIO(dec), None, 2, 2)
        assert dec.terminate() == 1
        assert q.equal(p)


class TestAlfCodec:
    def test_roundtrip_and_gain(self):
        planes = synth_frame(128, 128, seed=100)
        d1, r1, b1 = seq.encode_sequence([planes],
                                         seq.EncoderConfig(qp=37, alf=True))
        d0, r0, b0 = seq.encode_sequence([planes],
                                         seq.EncoderConfig(qp=37, alf=False))
        out, _ = seq.decode_sequence(d1, check_hash=True)
        for c in range(3):
            assert np.array_equal(out[0][c], r1[0][c])
        p_on = seq.psnr(planes[0], r1[0][0])
        p_off = seq.psnr(planes[0], r0[0][0])
        assert p_on >= p_off - 0.01   # never materially worse

    def test_engine_parity(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        planes = synth_frame(128, 128, seed=103)
        cfg = seq.EncoderConfig(qp=37, alf=True)
        sdata, srec, _ = seq.encode_sequence([planes], cfg)
        jdata, _, _ = jenc.encode_sequence([planes], cfg)
        assert jdata == sdata
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for c in range(3):
            assert np.array_equal(out[0][c], srec[0][c])
