"""Hierarchical-B random access GOP: spec roundtrips + engine parity."""
import numpy as np
import pytest

from vvctpu.spec import hls, sequence as seq

from test_inter_parity import motion_frames


class TestGopPlan:
    def test_gop8_structure(self):
        plan = seq.gop_plan(9, 0, 8)
        assert plan[0] == (0, hls.SLICE_I, (), 0)
        assert plan[1][0] == 8 and plan[1][1] == hls.SLICE_P
        mid = plan[2]
        assert mid[0] == 4 and mid[1] == hls.SLICE_B
        assert mid[2] == (0, 8)
        pocs = sorted(p[0] for p in plan)
        assert pocs == list(range(9))

    def test_ippp_still_works(self):
        plan = seq.gop_plan(4, 0, 1)
        assert [p[1] for p in plan] == [hls.SLICE_I] + [hls.SLICE_P] * 3

    def test_all_intra(self):
        plan = seq.gop_plan(3, 1, 1)
        assert all(p[1] == hls.SLICE_I for p in plan)


class TestSpecB:
    def test_gop4_roundtrip(self):
        frames = motion_frames(5, 64, 96, seed=70)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=4)
        data, recons, bits = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(5):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c]), (i, c)

    def test_b_frames_cheaper_than_p(self):
        frames = motion_frames(5, 64, 96, seed=71)
        _, _, bits_b = seq.encode_sequence(
            frames, seq.EncoderConfig(qp=32, intra_period=0, gop=4))
        _, _, bits_p = seq.encode_sequence(
            frames, seq.EncoderConfig(qp=32, intra_period=0, gop=1))
        assert sum(bits_b) < sum(bits_p) * 1.05


class TestPipelineB:
    def test_bitstream_identical(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(5, 64, 96, seed=72)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=4)
        sdata, srec, _ = seq.encode_sequence(frames, cfg)
        jdata, jrec, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        for i in range(5):
            for c in range(3):
                assert np.array_equal(jrec[i][c], srec[i][c])

    def test_pipeline_decode(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(5, 64, 96, seed=73)
        cfg = seq.EncoderConfig(qp=34, intra_period=0, gop=4)
        sdata, srec, _ = seq.encode_sequence(frames, cfg)
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for i in range(5):
            for c in range(3):
                assert np.array_equal(out[i][c], srec[i][c])
