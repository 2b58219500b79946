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
