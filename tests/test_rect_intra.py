"""Rectangular intra prediction: device twin vs spec model, bit-exact."""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.kernels import intra_pred
from vvctpu.spec import intra

SHAPES = [(8, 4), (4, 8), (16, 4), (4, 16), (32, 8), (8, 32), (16, 8),
          (8, 16), (32, 16), (16, 16)]


@pytest.mark.parametrize("w,h", SHAPES)
def test_predict_rect_parity(w, h):
    rng = np.random.default_rng(7 * w + h)
    # reference extents are 2w / 2h since r5 (VVC refW/refH)
    top = rng.integers(0, 256, 2 * w + 1).astype(np.int32)
    left = rng.integers(0, 256, 2 * h + 1).astype(np.int32)
    left[0] = top[0]
    for mode in range(rom.NUM_LUMA_MODE):
        ref = intra.predict(top, left, mode, w, h, False, 8)
        got = np.asarray(intra_pred.predict_rect(
            np.asarray(top), np.asarray(left), mode, w=w, h=h,
            is_luma=True, bd=8))
        assert np.array_equal(ref, got), f"mode {mode} shape {w}x{h}"


@pytest.mark.parametrize("w,h", [(8, 4), (16, 4), (32, 8)])
def test_predict_rect_chroma_parity(w, h):
    rng = np.random.default_rng(3 * w + h)
    top = rng.integers(0, 256, 2 * w + 1).astype(np.int32)
    left = rng.integers(0, 256, 2 * h + 1).astype(np.int32)
    left[0] = top[0]
    for mode in range(rom.NUM_LUMA_MODE):
        ref = intra.predict(top, left, mode, w, h, True, 8)
        got = np.asarray(intra_pred.predict_rect(
            np.asarray(top), np.asarray(left), mode, w=w, h=h,
            is_luma=False, bd=8))
        assert np.array_equal(ref, got), f"mode {mode} shape {w}x{h}"


@pytest.mark.parametrize("w,h", [(8, 4), (16, 4), (4, 16)])
def test_build_references_rect_in_frame(w, h):
    """in_frame_only availability == spec with an all-valid map."""
    rng = np.random.default_rng(w + 17 * h)
    fh, fw = 64, 64
    plane = rng.integers(0, 256, (fh, fw)).astype(np.int32)
    buf = np.zeros((fh + 1 + intra_pred.MARGIN, fw + 1 + intra_pred.MARGIN),
                   np.int32)
    buf[1:fh + 1, 1:fw + 1] = plane
    valid = np.ones((fh, fw), bool)
    for (x, y) in ((0, 0), (8, 0), (0, 8), (16, 12), (40, 36)):
        rt, rl = intra.build_references(plane, valid, x, y, w, h, 8)
        gt, gl = intra_pred.build_references_rect(
            np.asarray(buf), x, y, w=w, h=h, is_luma=True, frame_w=fw,
            frame_h=fh, n_ctu_x=1, bd=8, in_frame_only=True)
        assert np.array_equal(rt, np.asarray(gt)), (x, y)
        assert np.array_equal(rl, np.asarray(gl)), (x, y)
