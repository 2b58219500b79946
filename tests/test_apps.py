"""Aux apps: parcat, checkpoint/resume, cfg files (SURVEY §2.8/§5)."""
import numpy as np
import pytest

from vvctpu.io import cfg as cfgmod, yuv
from vvctpu.io.parcat import parcat
from vvctpu.spec import sequence as seq

from test_codec_roundtrip import synth_frame
from test_inter_parity import motion_frames


class TestParcat:
    def test_concat_two_segments(self):
        seg1 = motion_frames(3, 64, 96, seed=80)
        seg2 = motion_frames(3, 64, 96, seed=81)
        cfg = seq.EncoderConfig(qp=32, intra_period=0)
        d1, r1, _ = seq.encode_sequence(seg1, cfg)
        d2, r2, _ = seq.encode_sequence(seg2, cfg)
        merged = parcat([d1, d2])
        out, _ = seq.decode_sequence(merged, check_hash=True)
        assert len(out) == 6
        for i in range(3):
            for c in range(3):
                assert np.array_equal(out[i][c], r1[i][c])
                assert np.array_equal(out[3 + i][c], r2[i][c])

    def test_parcat_cli(self, tmp_path):
        from vvctpu.__main__ import main
        seg = motion_frames(2, 64, 64, seed=82)
        cfg = seq.EncoderConfig(qp=35)
        d1, _, _ = seq.encode_sequence(seg, cfg)
        p1 = tmp_path / "a.bin"
        p1.write_bytes(d1)
        p2 = tmp_path / "b.bin"
        p2.write_bytes(d1)
        po = tmp_path / "out.bin"
        assert main(["parcat", str(p1), str(p2), "-o", str(po)]) == 0
        out, _ = seq.decode_sequence(po.read_bytes(), check_hash=True)
        assert len(out) == 4


class TestCheckpoint:
    def test_resume_produces_identical_stream(self, tmp_path):
        frames = motion_frames(5, 64, 96, seed=83)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=4)
        ref_data, _, _ = seq.encode_sequence(frames, cfg)
        ck = str(tmp_path / "enc.npz")
        # run once to create the checkpoint (completes + checkpoints)
        seq.encode_sequence(frames, cfg, checkpoint_path=ck)
        # resume from it: must reproduce the identical stream
        data2, _, _ = seq.encode_sequence(frames, cfg, checkpoint_path=ck)
        assert data2 == ref_data


class TestCfgFiles:
    def test_layered_parse(self, tmp_path):
        base = tmp_path / "base.cfg"
        base.write_text(
            "SourceWidth : 176   # comment\n"
            "SourceHeight: 144\n"
            "QP          : 37\n"
            "IntraPeriod : -1\n"
            "GOPSize     : 8\n"
            "EntropyCodingSyncEnabled : 1\n"
            "UnknownFutureOption : 42\n")
        over = tmp_path / "seq.cfg"
        over.write_text("QP : 27\nFramesToBeEncoded : 9\n")
        c = cfgmod.load_layered([str(base), str(over)])
        assert (c.width, c.height) == (176, 144)
        assert c.qp == 27 and c.frames == 9
        assert c.intra_period == 0 and c.gop == 8 and c.wpp

    def test_cfg_driven_encode(self, tmp_path):
        from vvctpu.__main__ import main
        frames = [synth_frame(48, 64, seed=84)]
        src = tmp_path / "in.yuv"
        yuv.write_yuv(str(src), frames)
        out = tmp_path / "out.bin"
        cfgf = tmp_path / "e.cfg"
        cfgf.write_text(f"InputFile : {src}\nBitstreamFile : {out}\n"
                        "SourceWidth : 64\nSourceHeight : 48\nQP : 30\n")
        assert main(["encode", "-c", str(cfgf)]) == 0
        dec, _ = seq.decode_sequence(out.read_bytes(), check_hash=True)
        assert dec[0][0].shape == (48, 64)


class TestRateControl:
    def test_rc_converges_toward_target(self):
        frames = motion_frames(8, 64, 96, seed=95)
        base = seq.EncoderConfig(qp=22, intra_period=0)
        d0, _, b0 = seq.encode_sequence(frames, base)
        target = 1500
        rc_cfg = seq.EncoderConfig(qp=22, intra_period=0,
                                   rc_bits_per_frame=target)
        d1, _, b1 = seq.encode_sequence(frames, rc_cfg)
        seq.decode_sequence(d1, check_hash=True)
        assert abs(sum(b1) - target * 8) < abs(sum(b0) - target * 8)

    def test_rc_engines_identical(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(4, 64, 64, seed=96)
        cfg = seq.EncoderConfig(qp=26, intra_period=0,
                                rc_bits_per_frame=1200)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata

    def test_cfg_bitrate_keys(self, tmp_path):
        from vvctpu.io.cfg import parse_cfg_file, rc_bits_per_frame
        f = tmp_path / "rc.cfg"
        f.write_text("RateControl : 1\nTargetBitrate : 300000\n"
                     "FrameRate : 30\n")
        c = parse_cfg_file(str(f))
        assert rc_bits_per_frame(c) == 10000


class TestMctf:
    def test_prefilter_denoises_and_helps_rd(self):
        rng = np.random.default_rng(7)
        base = motion_frames(5, 64, 96, seed=97)
        noisy = [[np.clip(p + rng.integers(-8, 9, p.shape), 0,
                          255).astype(np.int32) for p in f] for f in base]
        from vvctpu.spec import mctf
        filt = mctf.temporal_filter(noisy, gop=1)
        # anchors get closer to the clean signal than the noisy input
        e_noisy = ((noisy[2][0] - base[2][0]) ** 2).mean()
        e_filt = ((filt[2][0] - base[2][0]) ** 2).mean()
        assert e_filt < e_noisy

    def test_engines_identical_with_mctf(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(4, 64, 64, seed=98)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=2, mctf=True)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        seq.decode_sequence(sdata, check_hash=True)


def test_bitstats_accounting():
    """Decode-side bin statistics (DecoderAnalyser role): tallies per
    syntax class, present for the coded tools, and decoding is unchanged."""
    import numpy as np
    from vvctpu.spec import sequence
    rng = np.random.default_rng(7)
    frames = [[rng.integers(0, 255, (64, 64)).astype(np.int32),
               np.full((32, 32), 128, np.int32),
               np.full((32, 32), 128, np.int32)] for _ in range(2)]
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0)
    data, recons, _ = sequence.encode_sequence(list(frames), cfg)
    stats = {}
    out, _ = sequence.decode_sequence(data, stats=stats)
    for poc in range(2):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)
    assert stats.get("sig_coeff_flag", 0) > 0
    assert stats.get("cu_skip_flag", 0) > 0       # P frame coded
    assert stats.get("(bypass)", 0) > 0
    assert sum(stats.values()) > 1000


class TestDistributedCLI:
    def test_single_process_noop(self, tmp_path):
        """--distributed on one process is a no-op init: full sequence,
        identical stream to a plain encode (dist.mesh.init_distributed
        CLI wiring, VERDICT r4 ask #8)."""
        from vvctpu.__main__ import main
        frames = motion_frames(2, 64, 64, seed=84)
        src = tmp_path / "in.yuv"
        yuv.write_yuv(str(src), frames)
        b1 = tmp_path / "plain.bin"
        b2 = tmp_path / "dist.bin"
        args = ["encode", "-i", str(src), "--wdt", "64", "--hgt", "64",
                "-q", "35", "-f", "2"]
        assert main(args + ["-b", str(b1)]) == 0
        assert main(args + ["-b", str(b2), "--distributed"]) == 0
        assert b2.read_bytes() == b1.read_bytes()  # 1 process: no .segN
