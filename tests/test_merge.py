"""Merge/skip mode: candidate derivation (spatial + TMVP + HMVP), MV
scaling, and stream-level behaviour (skip compresses static content).

Role of the reference's merge tests-by-conformance: VTM has no unit tests;
here the candidate logic is unit-tested directly and the syntax is covered
by the roundtrip + engine-parity suites.
"""
import numpy as np
import pytest

from vvctpu.spec import inter as sinter
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def _maps(gh=8, gw=8):
    inter_map = np.zeros((gh, gw, 2), bool)
    mv_map = np.zeros((gh, gw, 2, 2), np.int32)
    return inter_map, mv_map


class TestMergeCandidates:
    def test_empty_state_zero_fill(self):
        im, mv = _maps()
        c = sinter.merge_candidates(im, mv, 16, 16, 8, False)
        assert len(c) == sinter.MRG_MAX
        assert c[0] == (0, (0, 0), (0, 0))

    def test_spatial_left_above_order(self):
        im, mv = _maps()
        # left neighbour granule of (16,16) leaf: (15, 23) -> g(1, 2)
        im[2, 1, 0] = True
        mv[2, 1, 0] = (32, 16)
        # above neighbour granule: (23, 15) -> g(1, 2) col=2,row=1
        im[1, 2, 0] = True
        mv[1, 2, 0] = (-16, 0)
        c = sinter.merge_candidates(im, mv, 16, 16, 8, False)
        assert c[0] == (0, (32, 16), (0, 0))
        assert c[1] == (0, (-16, 0), (0, 0))

    def test_dedup(self):
        im, mv = _maps()
        im[2, 1, 0] = True
        mv[2, 1, 0] = (32, 16)
        im[1, 2, 0] = True
        mv[1, 2, 0] = (32, 16)
        c = sinter.merge_candidates(im, mv, 16, 16, 8, False)
        assert c[0] == (0, (32, 16), (0, 0))
        assert c[1] == (0, (0, 0), (0, 0))   # deduped -> zero fill

    def test_bi_neighbor(self):
        im, mv = _maps()
        im[2, 1] = (True, True)
        mv[2, 1, 0] = (4, 8)
        mv[2, 1, 1] = (-4, -8)
        c = sinter.merge_candidates(im, mv, 16, 16, 8, True)
        assert c[0] == (2, (4, 8), (-4, -8))

    def test_hmvp_after_spatial(self):
        im, mv = _maps()
        im[2, 1, 0] = True
        mv[2, 1, 0] = (32, 16)
        hmvp = [(0, (100, 0), (0, 0)), (0, (200, 0), (0, 0))]
        c = sinter.merge_candidates(im, mv, 16, 16, 8, False, hmvp=hmvp)
        assert c[0] == (0, (32, 16), (0, 0))
        assert c[1] == (0, (200, 0), (0, 0))   # most recent first
        assert c[2] == (0, (100, 0), (0, 0))

    def test_pairwise_average(self):
        im, mv = _maps()
        im[2, 1, 0] = True
        mv[2, 1, 0] = (32, 16)
        im[1, 2, 0] = True
        mv[1, 2, 0] = (-16, 0)
        c = sinter.merge_candidates(im, mv, 16, 16, 8, False)
        assert c[2] == (0, ((32 - 16 + 1) >> 1, (16 + 0 + 1) >> 1), (0, 0))

    def test_hmvp_fifo(self):
        h = []
        for i in range(7):
            sinter.hmvp_push(h, (0, (i, i), (0, 0)))
        assert len(h) == sinter.HMVP_MAX
        assert h[-1] == (0, (6, 6), (0, 0))
        sinter.hmvp_push(h, (0, (4, 4), (0, 0)))   # move-to-latest
        assert h[-1] == (0, (4, 4), (0, 0))
        assert len(h) == sinter.HMVP_MAX


class TestMvScaling:
    def test_identity(self):
        assert sinter.mv_scale_factor(4, 4) == 256

    def test_half(self):
        assert sinter.mv_scale_factor(2, 4) == 128

    def test_negative_td(self):
        # col ref is in the future: flip sign
        assert sinter.mv_scale_factor(2, -2) == -256

    def test_zero_td(self):
        assert sinter.mv_scale_factor(2, 0) is None

    def test_col_motion_scaling(self):
        gh, gw = 4, 4
        inter8 = np.ones((gh, gw), np.uint8)
        dir8 = np.zeros((gh, gw), np.uint8)
        mv8 = np.full((gh, gw, 2), 64, np.int32)
        mv8_l1 = np.zeros((gh, gw, 2), np.int32)
        # col at poc 4 referencing poc 0 (td=4); current poc 6 ref poc 4 (tb=2)
        col = sinter.build_col_motion(inter8, dir8, mv8, mv8_l1,
                                      4, (0,), 6, (4,))
        assert col is not None
        assert col["avail"].all()
        np.testing.assert_array_equal(col["mv"][0],
                                      np.full((gh, gw, 2), 32, np.int32))

    def test_col_motion_intra_none(self):
        gh, gw = 4, 4
        col = sinter.build_col_motion(np.zeros((gh, gw), np.uint8),
                                      np.zeros((gh, gw), np.uint8),
                                      np.zeros((gh, gw, 2), np.int32),
                                      np.zeros((gh, gw, 2), np.int32),
                                      4, (0,), 6, (4,))
        assert col is None


class TestStreamLevel:
    def test_static_scene_skips_cheap(self, monkeypatch):
        """A repeated frame codes mostly as merge/skip: bits collapse vs
        the I frame and the merge-index coder is actually exercised."""
        from vvctpu.spec import codec as scodec
        n_merge = [0]
        orig = scodec._code_merge_idx

        def counting(io, idx=None):
            n_merge[0] += 1
            return orig(io, idx)

        monkeypatch.setattr(scodec, "_code_merge_idx", counting)
        base = motion_frames(1, 64, 96, seed=90)[0]
        frames = [base, [p.copy() for p in base], [p.copy() for p in base]]
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=1)
        data, recons, bits = seq.encode_sequence(frames, cfg)
        assert n_merge[0] > 0          # merge/skip leaves exist
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(3):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])
        # residual isn't exactly zero (refs are loop-filtered) but merge +
        # skip must still collapse static P frames well below the I frame
        assert bits[1] < bits[0] // 3
        assert bits[2] < bits[0] // 3

    def test_translating_scene_roundtrip(self):
        frames = motion_frames(4, 64, 96, seed=91)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=1)
        data, recons, bits = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(4):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_b_gop_roundtrip_with_tmvp(self):
        frames = motion_frames(5, 64, 96, seed=92)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=4)
        data, recons, bits = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(5):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_engines_identical_with_merge(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(5, 64, 96, seed=93)
        cfg = seq.EncoderConfig(qp=30, intra_period=0, gop=4)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        jout, _ = jenc.decode_sequence(sdata)
        sout, _ = seq.decode_sequence(sdata)
        for a, b in zip(jout, sout):
            for c in range(3):
                assert np.array_equal(a[c], b[c])
