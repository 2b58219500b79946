"""Wide-angle intra remap (rom.wide_angle_mode; VVC 8.4.5.2.6 analog).

Non-square blocks remap near-diagonal angular modes to angles steeper
than 45 degrees at prediction time; the signalled mode stays 0..66.
Engine parity over every mode/shape is separately enforced by
tests/test_rect_intra.py — here the mapping itself and the behavioural
effect are pinned.
"""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.spec import intra

pytestmark = pytest.mark.quick


class TestMapping:
    def test_square_identity(self):
        for m in (0, 1, 2, 34, 66):
            assert rom.wide_angle_mode(m, 16, 16) == m

    def test_wide_high(self):
        # W > H, ratio 2: modes 2..7 -> 67..72
        assert rom.wide_angle_mode(2, 16, 8) == 67
        assert rom.wide_angle_mode(7, 16, 8) == 72
        assert rom.wide_angle_mode(8, 16, 8) == 8
        # ratio 4: modes 2..11 -> 67..76
        assert rom.wide_angle_mode(11, 32, 8) == 76
        assert rom.wide_angle_mode(12, 32, 8) == 12

    def test_wide_low(self):
        # H > W, ratio 2: modes 61..66 -> encoded 86..81
        assert rom.wide_angle_mode(66, 8, 16) == 81
        assert rom.wide_angle_mode(61, 8, 16) == 86
        assert rom.wide_angle_mode(60, 8, 16) == 60
        # ratio 4: modes 57..66 remap
        assert rom.wide_angle_mode(57, 8, 32) == 90
        assert rom.wide_angle_mode(56, 8, 32) == 56

    def test_planar_dc_never(self):
        assert rom.wide_angle_mode(0, 16, 8) == 0
        assert rom.wide_angle_mode(1, 8, 16) == 1

    def test_extended_angles(self):
        assert rom.INTRA_PRED_ANGLE[67] == 35
        assert rom.INTRA_PRED_ANGLE[80] == 512
        assert rom.INTRA_PRED_ANGLE[81] == 35    # wide-low mirror


class TestPrediction:
    def test_wide_changes_prediction(self):
        """On a 16x8 block, mode 2 (remapped to 67: angle 35 FROM TOP)
        must differ from the unmapped mode-2 (angle 32 from left) — a
        top-row gradient makes the difference visible."""
        w, h = 16, 8
        top = np.minimum(np.arange(2 * w + 1, dtype=np.int64) * 8 + 16, 255)
        left = np.full(2 * h + 1, 128, np.int64)
        wide = intra.predict(top, left, 2, w, h)
        # same refs, forced non-wide (diagonal mode from the left side)
        narrow = intra._angular(top, left, 2, w, h, False, False)
        assert not np.array_equal(wide, np.clip(narrow, 0, 255))

    def test_extended_row_actually_read(self):
        """r5: wide-angle rays read the 2w-extent — samples beyond w+h
        must influence the prediction (they clamped before)."""
        w, h = 16, 8
        rng = np.random.default_rng(9)
        top = rng.integers(0, 256, 2 * w + 1).astype(np.int64)
        left = rng.integers(0, 256, 2 * h + 1).astype(np.int64)
        left[0] = top[0]
        base = intra.predict(top, left, 2, w, h)   # mode 2 -> 67, angle 35
        top2 = top.copy()
        top2[w + h + 1:] = 0                       # beyond the old extent
        changed = intra.predict(top2, left, 2, w, h)
        assert not np.array_equal(base, changed)

    def test_device_parity_wide_shapes(self):
        jax = pytest.importorskip("jax")
        import jax.numpy as jnp
        from vvctpu.kernels import intra_pred
        rng = np.random.default_rng(3)
        for (w, h) in ((16, 8), (8, 16), (32, 8), (8, 32)):
            top = rng.integers(0, 256, 2 * w + 1).astype(np.int64)
            left = rng.integers(0, 256, 2 * h + 1).astype(np.int64)
            for mode in (2, 5, 7, 11, 57, 61, 63, 66):
                want = intra.predict(top, left, mode, w, h)
                got = np.asarray(intra_pred.predict_rect(
                    jnp.asarray(top, jnp.int32), jnp.asarray(left, jnp.int32),
                    jnp.int32(mode), w=w, h=h, is_luma=True))
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"{w}x{h} m{mode}")
