"""Spec-codec end-to-end: encode -> Annex-B -> decode, hash-SEI verified.

This is the workhorse oracle of the reference's test strategy (SURVEY.md §4:
decoded-picture-hash SEI + encoder-embedded decoder match), recreated here.
"""
import numpy as np
import pytest

from vvctpu.io import yuv
from vvctpu.spec import codec, decide, hls, sequence as seq


def synth_frame(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (80 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
         + rng.integers(-8, 8, (h, w))).clip(0, 255).astype(np.int32)
    cb = (128 + 20 * np.sin(xx[::2, ::2] / 5.0)).astype(np.int32)
    cr = (128 - 15 * np.cos(yy[::2, ::2] / 6.0)).astype(np.int32)
    return [y, cb.clip(0, 255), cr.clip(0, 255)]


class TestRoundtrip:
    def test_single_frame_hash_verified(self):
        planes = synth_frame(64, 96)
        data, recons, bits = seq.encode_sequence([planes],
                                                 seq.EncoderConfig(qp=32))
        frames, sps = seq.decode_sequence(data, check_hash=True)
        for c in range(3):
            assert np.array_equal(frames[0][c], recons[0][c])
        assert bits[0] > 0

    def test_non_ctu_multiple_size(self):
        # conformance-window path: 100x52 is not a CTU multiple
        planes = synth_frame(52, 100, seed=3)
        data, recons, _ = seq.encode_sequence([planes],
                                              seq.EncoderConfig(qp=30))
        frames, sps = seq.decode_sequence(data)
        assert frames[0][0].shape == (52, 100)
        assert np.array_equal(frames[0][0], recons[0][0])

    def test_multi_frame(self):
        frames_in = [synth_frame(64, 64, seed=s) for s in range(2)]
        data, recons, _ = seq.encode_sequence(frames_in,
                                              seq.EncoderConfig(qp=35))
        frames, _ = seq.decode_sequence(data)
        assert len(frames) == 2
        for f, r in zip(frames, recons):
            for c in range(3):
                assert np.array_equal(f[c], r[c])

    def test_hash_detects_corruption(self):
        planes = synth_frame(64, 64, seed=9)
        data, _, _ = seq.encode_sequence([planes], seq.EncoderConfig(qp=32))
        bad = bytearray(data)
        # flip a bit late in the stream (inside slice payload)
        bad[-40] ^= 0x10
        with pytest.raises(Exception):
            seq.decode_sequence(bytes(bad), check_hash=True)

    @pytest.mark.parametrize("qp", [22, 37, 50])
    def test_qp_ladder_rd_monotone(self, qp):
        planes = synth_frame(64, 96, seed=1)
        data, recons, bits = seq.encode_sequence([planes],
                                                 seq.EncoderConfig(qp=qp))
        frames, _ = seq.decode_sequence(data)
        p = seq.psnr(planes[0], frames[0][0])
        assert p > 25.0
        if qp <= 22:
            assert p > 38.0

    def test_decisions_roundtrip_through_bitstream(self):
        """Parsed decisions must equal encoder decisions (syntax fidelity)."""
        planes = synth_frame(64, 64, seed=5)
        cfg = seq.EncoderConfig(qp=32)
        sps = cfg.make_sps(64, 64)
        pps = hls.PPS(init_qp=cfg.qp)
        padded = codec.pad_planes(planes, sps)
        dec = decide.decide_frame(padded[0], cfg.qp)
        payload, _ = codec.encode_frame(planes, sps, pps,
                                        hls.SliceHeader(poc=0), dec)
        _, _, parsed = codec.decode_frame(payload, sps, {0: pps})
        assert np.array_equal(parsed.split32, dec.split32)
        assert np.array_equal(parsed.split16, dec.split16)
        assert np.array_equal(parsed.modes8, dec.modes8)


class TestYuvIO:
    def test_roundtrip(self, tmp_path):
        frames = [synth_frame(32, 48, seed=s) for s in range(3)]
        p = tmp_path / "t.yuv"
        yuv.write_yuv(str(p), frames)
        back = yuv.read_yuv(str(p), 48, 32)
        assert len(back) == 3
        for f, b in zip(frames, back):
            for c in range(3):
                assert np.array_equal(f[c], b[c])

    def test_10bit(self, tmp_path):
        rng = np.random.default_rng(0)
        f = [rng.integers(0, 1024, (16, 16)).astype(np.int32),
             rng.integers(0, 1024, (8, 8)).astype(np.int32),
             rng.integers(0, 1024, (8, 8)).astype(np.int32)]
        p = tmp_path / "t10.yuv"
        yuv.write_yuv(str(p), [f], bit_depth=10)
        back = yuv.read_yuv(str(p), 16, 16, bit_depth=10)
        for c in range(3):
            assert np.array_equal(back[0][c], f[c])


class TestTracing:
    def test_enc_dec_traces_identical(self, tmp_path):
        from vvctpu.core import trace
        planes = synth_frame(64, 64, seed=13)
        ta, tb = str(tmp_path / "enc.trc"), str(tmp_path / "dec.trc")
        trace.open_trace(ta)
        data, _, _ = seq.encode_sequence([planes], seq.EncoderConfig(qp=32))
        trace.close_trace()
        trace.open_trace(tb)
        seq.decode_sequence(data)
        trace.close_trace()
        assert trace.diff_traces(ta, tb) is None
        assert open(ta).readline().startswith("D_")

    def test_rule_filters(self, tmp_path):
        from vvctpu.core import trace
        planes = synth_frame(64, 64, seed=14)
        tf = str(tmp_path / "f.trc")
        trace.open_trace(tf, "D_MODE:poc==1")
        seq.encode_sequence([planes], seq.EncoderConfig(qp=32))
        trace.close_trace()
        assert open(tf).read() == ""  # only poc 0 exists


class Test10Bit:
    def test_roundtrip_10bit(self):
        rng = np.random.default_rng(60)
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w]
        y10 = (400 + 240 * np.sin(xx / 9.0) + 160 * np.cos(yy / 7.0)
               + rng.integers(-30, 30, (h, w))).clip(0, 1023).astype(np.int32)
        cb = (512 + 80 * np.sin(xx[::2, ::2] / 5.0)).clip(
            0, 1023).astype(np.int32)
        cr = (512 - 60 * np.cos(yy[::2, ::2] / 6.0)).clip(
            0, 1023).astype(np.int32)
        cfg = seq.EncoderConfig(qp=32, bit_depth=10)
        data, recons, bits = seq.encode_sequence([[y10, cb, cr]], cfg)
        out, sps = seq.decode_sequence(data, check_hash=True)
        assert sps.bit_depth == 10
        for c in range(3):
            assert np.array_equal(out[0][c], recons[0][c])
        assert seq.psnr(y10, out[0][0], 10) > 35.0
