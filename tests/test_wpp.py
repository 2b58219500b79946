"""WPP (wavefront entropy lanes): roundtrips, engine parity, invariance."""
import numpy as np
import pytest

from vvctpu.spec import sequence as seq

from test_codec_roundtrip import synth_frame


class TestWpp:
    def test_spec_roundtrip(self):
        planes = synth_frame(192, 128, seed=50)   # 3 CTU rows
        cfg = seq.EncoderConfig(qp=32, wpp=True)
        data, recons, bits = seq.encode_sequence([planes], cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for c in range(3):
            assert np.array_equal(out[0][c], recons[0][c])

    def test_recon_invariant_to_wpp(self):
        """WPP restructures entropy lanes only; recon must be identical."""
        planes = synth_frame(192, 128, seed=51)
        d1, r1, b1 = seq.encode_sequence([planes],
                                         seq.EncoderConfig(qp=30, wpp=True))
        d2, r2, b2 = seq.encode_sequence([planes],
                                         seq.EncoderConfig(qp=30, wpp=False))
        for c in range(3):
            assert np.array_equal(r1[0][c], r2[0][c])
        # entropy restart costs a few bits but stays in the same ballpark
        assert abs(b1[0] - b2[0]) < 0.1 * b2[0] + 512

    def test_pipeline_bitstream_identical(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        planes = synth_frame(192, 128, seed=52)
        cfg = seq.EncoderConfig(qp=34, wpp=True)
        sdata, srec, _ = seq.encode_sequence([planes], cfg)
        jdata, jrec, _ = jenc.encode_sequence([planes], cfg)
        assert jdata == sdata

    def test_pipeline_decode_wpp(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        planes = synth_frame(192, 128, seed=53)
        cfg = seq.EncoderConfig(qp=32, wpp=True)
        sdata, srec, _ = seq.encode_sequence([planes], cfg)
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for c in range(3):
            assert np.array_equal(out[0][c], srec[0][c])

    def test_wpp_with_inter(self):
        base = synth_frame(192, 128, seed=54)
        frames = [[np.roll(base[0], (2*t, 3*t), (0, 1)),
                   np.roll(base[1], (t, t), (0, 1)),
                   np.roll(base[2], (t, t), (0, 1))] for t in range(2)]
        cfg = seq.EncoderConfig(qp=32, wpp=True, intra_period=0)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(2):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])
