"""Pallas dense-ME kernel == XLA lax.scan dense stage, bit-identical.

Runs the kernel in interpreter mode (tests pin JAX_PLATFORMS=cpu); on the
real TPU the same equality is checked by tools/profile_me_pallas-style
probes (see PALLAS.md for measured timings).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vvctpu.coding import me as jme  # noqa: E402
from vvctpu.spec.inter import REF_MARGIN  # noqa: E402

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("tt", [False, True])
def test_pallas_dense_equals_xla(tt):
    H, W = 64, 128
    rng = np.random.default_rng(3)
    orig = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = (np.roll(orig, (1, -2), (0, 1))
           + rng.integers(-4, 5, (H, W))).clip(0, 255).astype(np.int32)
    refp80 = jnp.asarray(np.pad(ref, REF_MARGIN, mode="edge"))
    jorig = jnp.asarray(orig)
    lam = 211

    xla = jme._me_pass_impl(jorig, refp80, jnp.int32(lam), frame_w=W,
                            frame_h=H, tt=tt, ext=False)
    pal = jme.me_pass_pallas_dense(jorig, refp80, lam, frame_w=W,
                                   frame_h=H, tt=tt, interpret=True)
    keys = jme._ME_KEYS + (jme._TT_KEYS if tt else ())
    assert len(xla) == len(pal) == len(keys)
    for k, (xc, xm), (pc, pm) in zip(keys, xla, pal):
        np.testing.assert_array_equal(np.asarray(xc), np.asarray(pc),
                                      err_msg=f"cost key {k}")
        np.testing.assert_array_equal(np.asarray(xm), np.asarray(pm),
                                      err_msg=f"mv key {k}")


def test_me_pass_env_switch(monkeypatch):
    """me_pass with VVCTPU_PALLAS_ME routes through the kernel and
    matches the default path (interpret fallback on CPU)."""
    H, W = 64, 128
    rng = np.random.default_rng(5)
    orig = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = np.roll(orig, 2, 1).astype(np.int32)
    refp80 = jnp.asarray(np.pad(ref, REF_MARGIN, mode="edge"))
    jorig = jnp.asarray(orig)
    base = jme.me_pass(jorig, refp80, np.int64(211), frame_w=W, frame_h=H,
                       tt=False, ext=False)
    monkeypatch.setenv("VVCTPU_PALLAS_ME", "1")
    orig_fn = jme.me_pass_pallas_dense
    monkeypatch.setattr(
        jme, "me_pass_pallas_dense",
        lambda *a, **k: orig_fn(*a, **{**k, "interpret": True}))
    got = jme.me_pass(jorig, refp80, np.int64(211), frame_w=W, frame_h=H,
                      tt=False, ext=False)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k][0]),
                                      np.asarray(got[k][0]), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(base[k][1]),
                                      np.asarray(got[k][1]), err_msg=str(k))
