"""JAX pipeline vs spec model: byte-identical bitstreams, bit-exact recon."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vvctpu.spec import sequence as sseq  # noqa: E402
from vvctpu.pipeline import encoder as jenc  # noqa: E402

from test_codec_roundtrip import synth_frame  # noqa: E402


class TestPipelineParity:
    @pytest.mark.parametrize("qp", [22, 32, 45])
    def test_bitstream_identical(self, qp):
        planes = synth_frame(64, 64, seed=qp)
        cfg = sseq.EncoderConfig(qp=qp)
        sdata, srec, sbits = sseq.encode_sequence([planes], cfg)
        jdata, jrec, jbits = jenc.encode_sequence([planes], cfg)
        assert jdata == sdata, "pipeline bitstream differs from spec"
        for c in range(3):
            assert np.array_equal(jrec[0][c], srec[0][c])

    def test_jax_decode_spec_stream(self):
        planes = synth_frame(64, 96, seed=2)
        cfg = sseq.EncoderConfig(qp=32)
        sdata, srec, _ = sseq.encode_sequence([planes], cfg)
        frames, _ = jenc.decode_sequence(sdata, check_hash=True)
        for c in range(3):
            assert np.array_equal(frames[0][c], srec[0][c])

    def test_spec_decode_jax_stream(self):
        planes = synth_frame(64, 96, seed=4)
        cfg = sseq.EncoderConfig(qp=30)
        jdata, jrec, _ = jenc.encode_sequence([planes], cfg)
        frames, _ = sseq.decode_sequence(jdata, check_hash=True)
        for c in range(3):
            assert np.array_equal(frames[0][c], jrec[0][c])

    def test_non_multiple_size(self):
        planes = synth_frame(52, 100, seed=6)
        cfg = sseq.EncoderConfig(qp=34)
        sdata, _, _ = sseq.encode_sequence([planes], cfg)
        jdata, _, _ = jenc.encode_sequence([planes], cfg)
        assert jdata == sdata


class TestMts:
    def test_mts_bitstream_identical_and_rd(self):
        planes = synth_frame(64, 96, seed=90)
        cfg_on = sseq.EncoderConfig(qp=32, mts=True)
        cfg_off = sseq.EncoderConfig(qp=32, mts=False)
        sdata, srec, sbits = sseq.encode_sequence([planes], cfg_on)
        jdata, jrec, jbits = jenc.encode_sequence([planes], cfg_on)
        assert jdata == sdata
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for c in range(3):
            assert np.array_equal(out[0][c], srec[0][c])
        # MTS must not lose quality at roughly comparable rate
        doff, roff, boff = sseq.encode_sequence([planes], cfg_off)
        p_on = sseq.psnr(planes[0], srec[0][0])
        p_off = sseq.psnr(planes[0], roff[0][0])
        assert p_on >= p_off - 0.05

    def test_mts_with_inter_frames(self):
        from test_inter_parity import motion_frames
        frames = motion_frames(3, 64, 96, seed=91)
        cfg = sseq.EncoderConfig(qp=32, intra_period=0, mts=True)
        sdata, srec, _ = sseq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for i in range(3):
            for c in range(3):
                assert np.array_equal(out[i][c], srec[i][c])
