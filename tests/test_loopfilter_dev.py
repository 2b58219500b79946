"""Device loop-filter twins (SURVEY §2.9 rows: deblock / SAO device tier):
bit-identical to the spec numpy filters."""
import numpy as np
import pytest

pytest.importorskip("jax")

from vvctpu.spec import codec, deblock as sdb, sequence as seq
from vvctpu.spec import decide as sdec
from vvctpu.kernels import loopfilter as lf

from test_inter_parity import motion_frames


def _frame_and_dec(seed=21, h=64, w=128, qp=32, mtt=False):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    Y = (90 + 70 * np.sin(xx / 7.0) + 50 * np.cos(yy / 5.0)
         + rng.integers(-20, 20, (h, w))).clip(0, 255).astype(np.int32)
    cb = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    cr = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    dec = sdec.decide_frame(Y, qp, 8, mtt=mtt)
    return [Y, cb, cr], dec


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_deblock_device_bit_identical(qp):
    planes, dec = _frame_and_dec(seed=qp)
    ref = sdb.deblock_frame([p.copy() for p in planes], dec, qp, 8)
    got = lf.deblock_frame_j(planes, dec, qp, 8)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_deblock_device_bit_identical_mtt():
    planes, dec = _frame_and_dec(seed=7, mtt=True)
    ref = sdb.deblock_frame([p.copy() for p in planes], dec, 32, 8)
    got = lf.deblock_frame_j(planes, dec, 32, 8)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_sao_apply_device_bit_identical():
    from vvctpu.spec import sao as ss
    planes, dec = _frame_and_dec(seed=9)
    rec = sdb.deblock_frame([p.copy() for p in planes], dec, 32, 8)
    orig = [p.copy() for p in planes]
    params = ss.decide_sao(orig, rec, 32, 64, 8)
    ref = ss.apply_sao(rec, params, 64, 8)
    got = lf.apply_sao_j(rec, params, 64, 8)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_alf_device_bit_identical():
    from vvctpu.spec import alf as salf
    planes, dec = _frame_and_dec(seed=13)
    rec = sdb.deblock_frame([p.copy() for p in planes], dec, 30, 8)
    orig = [p.copy() for p in planes]
    params = salf.derive_alf_frame(orig, rec, 30, 64, 8)
    ref = salf.apply_alf_frame(rec, params, 64, 8)
    got = lf.apply_alf_frame_j(rec, params, 64, 8)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_prod_gt_exact():
    import jax.numpy as jnp
    from vvctpu.kernels.loopfilter import _prod_gt
    rng = np.random.default_rng(3)
    a, b, c, d = (rng.integers(0, 1 << 17, 4000).astype(np.int32)
                  for _ in range(4))
    want = a.astype(np.int64) * b > c.astype(np.int64) * d
    got = np.asarray(_prod_gt(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(d)))
    assert np.array_equal(want, got)
