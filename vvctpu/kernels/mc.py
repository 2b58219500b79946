"""JAX motion-compensation kernels — device twin of spec/inter.py MC.

Unified two-stage separable FIR: the integer-phase filter row is an exact
delta (64 at the centre tap), and (64*A + 2048) >> 12 == (A + 32) >> 6, so
one code path reproduces all four numpy special cases bit-exactly (proof in
tests/test_inter_parity.py).  8-tap luma at 1/16-pel, 4-tap chroma at 1/32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom
from ..spec.inter import MV_FRAC_BITS, REF_MARGIN

_TAPS_L = np.asarray(rom.mc_filter_luma(), np.int32)
_TAPS_C = np.asarray(rom.mc_filter_chroma(), np.int32)


def mc_luma_block(ref_pad, x, y, s: int, mvx, mvy, bd: int = 8,
                  margin: int = REF_MARGIN):
    """(s, s) MC luma block from a margin-padded reference plane."""
    ix = mvx >> MV_FRAC_BITS
    iy = mvy >> MV_FRAC_BITS
    fx = mvx & 15
    fy = mvy & 15
    x0 = x + ix + margin - 3
    y0 = y + iy + margin - 3
    win = jax.lax.dynamic_slice(ref_pad, (y0, x0), (s + 7, s + 7))
    win = win.astype(jnp.int32)
    th = jnp.asarray(_TAPS_L)[fx]
    tv = jnp.asarray(_TAPS_L)[fy]
    tmp = jnp.zeros((s + 7, s), jnp.int32)
    for t in range(8):
        tmp = tmp + th[t] * jax.lax.dynamic_slice_in_dim(win, t, s, axis=1)
    acc = jnp.zeros((s, s), jnp.int32)
    for t in range(8):
        acc = acc + tv[t] * jax.lax.dynamic_slice_in_dim(tmp, t, s, axis=0)
    return jnp.clip((acc + 2048) >> 12, 0, (1 << bd) - 1)


def mc_chroma_block(ref_pad, x, y, s: int, mvx, mvy, bd: int = 8,
                    margin: int = REF_MARGIN // 2):
    ix = mvx >> 5
    iy = mvy >> 5
    fx = mvx & 31
    fy = mvy & 31
    x0 = x + ix + margin - 1
    y0 = y + iy + margin - 1
    win = jax.lax.dynamic_slice(ref_pad, (y0, x0), (s + 3, s + 3))
    win = win.astype(jnp.int32)
    th = jnp.asarray(_TAPS_C)[fx]
    tv = jnp.asarray(_TAPS_C)[fy]
    tmp = jnp.zeros((s + 3, s), jnp.int32)
    for t in range(4):
        tmp = tmp + th[t] * jax.lax.dynamic_slice_in_dim(win, t, s, axis=1)
    acc = jnp.zeros((s, s), jnp.int32)
    for t in range(4):
        acc = acc + tv[t] * jax.lax.dynamic_slice_in_dim(tmp, t, s, axis=0)
    return jnp.clip((acc + 2048) >> 12, 0, (1 << bd) - 1)
