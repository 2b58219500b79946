"""Deblocking filter tests: edge masks, filter behaviour, loop closure."""
import numpy as np
import pytest

from vvctpu.spec import deblock
from vvctpu.spec.codec import FrameDecisions

from test_codec_roundtrip import synth_frame


def _dec_all_leaf8(h, w):
    d = FrameDecisions.empty(h, w)
    d.split32[:] = 1
    d.split16[:] = 1
    return d


class TestEdgeMasks:
    def test_leaf8_everywhere(self):
        d = _dec_all_leaf8(64, 64)
        ver, hor = deblock.edge_masks(d, 64, 64)
        assert ver.shape == (8, 8)
        assert ver[:, 0].sum() == 0 and ver[:, 1:].all()
        assert hor[0, :].sum() == 0 and hor[1:, :].all()

    def test_leaf32_only(self):
        d = FrameDecisions.empty(64, 64)
        ver, hor = deblock.edge_masks(d, 64, 64)
        # only the 32-aligned interior edge is active
        assert ver[:, 4].all()
        assert not ver[:, 1].any() and not ver[:, 2].any()


class TestFilter:
    def test_smooths_step_edge(self):
        d = _dec_all_leaf8(64, 64)
        y = np.zeros((64, 64), np.int32)
        y[:, :8] = 100
        y[:, 8:] = 120
        cb = np.full((32, 32), 128, np.int32)
        out = deblock.deblock_frame([y, cb, cb.copy()], d, qp=37)
        # the step at x=8 must be softened
        assert out[0][5, 7] > 100 and out[0][5, 8] < 120
        # far from edges untouched
        assert out[0][5, 20] == 120

    def test_flat_region_unchanged(self):
        d = _dec_all_leaf8(64, 64)
        y = np.full((64, 64), 77, np.int32)
        cb = np.full((32, 32), 99, np.int32)
        out = deblock.deblock_frame([y, cb, cb.copy()], d, qp=32)
        assert (out[0] == 77).all() and (out[1] == 99).all()

    def test_qp_zero_noop(self):
        d = _dec_all_leaf8(64, 64)
        rng = np.random.default_rng(0)
        y = rng.integers(0, 256, (64, 64)).astype(np.int32)
        cb = rng.integers(0, 256, (32, 32)).astype(np.int32)
        out = deblock.deblock_frame([y, cb, cb.copy()], d, qp=0)
        assert np.array_equal(out[0], y)

    def test_strong_edge_preserved(self):
        """A big true edge (|p0-q0| large) must NOT be smoothed away."""
        d = _dec_all_leaf8(64, 64)
        y = np.zeros((64, 64), np.int32)
        y[:, 8:] = 255
        cb = np.full((32, 32), 128, np.int32)
        out = deblock.deblock_frame([y, cb, cb.copy()], d, qp=30)
        assert out[0][5, 7] <= 30 and out[0][5, 8] >= 225


class TestLoopClosure:
    def test_roundtrip_with_deblock(self):
        from vvctpu.spec import sequence as seq
        planes = synth_frame(64, 96, seed=11)
        data, recons, _ = seq.encode_sequence([planes],
                                              seq.EncoderConfig(qp=32))
        frames, _ = seq.decode_sequence(data, check_hash=True)
        for c in range(3):
            assert np.array_equal(frames[0][c], recons[0][c])
