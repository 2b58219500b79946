"""Batched integer motion estimation on device — twin of spec/decide.py
me_size_pass.

One scan over the dense +-ME_RANGE offset grid computes the whole-frame
8x8-block SAD map per offset (abs-diff plane + reshape reduction — VPU work);
16/32 SADs are aggregated from the 8x8 map (SAD is additive over subblocks,
so this is numerically identical to per-size evaluation).  Running strict-min
in candidate row-major order keeps tie-breaking identical to the numpy
reference.  Redesign of VTM:EncoderLib/InterSearch.cpp xTZSearch per
SURVEY.md §2.9 (sad_satd kernel family).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.inter import ME_RANGE, mv_bits_est

I32MAX = np.iinfo(np.int32).max


def _offsets_with_bits() -> np.ndarray:
    """(n, 3) int32 [dy, dx, bits] in row-major (dy, dx) order."""
    r = ME_RANGE
    rows = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            rows.append((dy, dx, mv_bits_est(dx, dy)))
    return np.asarray(rows, np.int32)


_OFFSETS = _offsets_with_bits()


@functools.partial(jax.jit, static_argnames=("frame_w", "frame_h"))
def me_pass(orig, refp, lam, *, frame_w: int, frame_h: int):
    """Full-search ME for all of sizes 8/16/32 at once.

    orig: (H, W) int32; refp: (H+2R, W+2R) int32 edge-padded reference.
    Returns dict size -> (cost int64 (nby, nbx), mv int32 (nby, nbx, 2))."""
    h, w = frame_h, frame_w
    n8y, n8x = h // 8, w // 8
    offs = jnp.asarray(_OFFSETS)
    lam = jnp.asarray(lam, jnp.int32)

    def agg(c, f):
        return c.reshape(c.shape[0] // f, f, c.shape[1] // f, f).sum((1, 3))

    def init(ny, nx):
        return (jnp.full((ny, nx), I32MAX, jnp.int32),
                jnp.zeros((ny, nx), jnp.int32),
                jnp.zeros((ny, nx), jnp.int32))

    carry0 = tuple(init(h // s, w // s) for s in (8, 16, 32))

    def body(carry, off):
        dy, dx, bits = off[0], off[1], off[2]
        win = jax.lax.dynamic_slice(refp, (ME_RANGE + dy, ME_RANGE + dx),
                                    (h, w))
        d = jnp.abs(orig.astype(jnp.int32) - win.astype(jnp.int32))
        sad8 = d.reshape(n8y, 8, n8x, 8).sum((1, 3))
        sads = {8: sad8, 16: agg(sad8, 2), 32: agg(sad8, 4)}
        out = []
        for i, s in enumerate((8, 16, 32)):
            cost, bx, by = carry[i]
            c = (sads[s] << 8) + lam * bits
            better = c < cost
            out.append((jnp.where(better, c, cost),
                        jnp.where(better, dx, bx),
                        jnp.where(better, dy, by)))
        return tuple(out), None

    carry, _ = jax.lax.scan(body, carry0, offs)
    return {s: (carry[i][0], jnp.stack([carry[i][1], carry[i][2]], -1))
            for i, s in enumerate((8, 16, 32))}
