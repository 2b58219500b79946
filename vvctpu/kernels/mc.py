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
                  margin: int = REF_MARGIN, h: int | None = None):
    """(h, s) MC luma block from a margin-padded reference plane
    (h defaults to s — square)."""
    hh = s if h is None else h
    ix = mvx >> MV_FRAC_BITS
    iy = mvy >> MV_FRAC_BITS
    fx = mvx & 15
    fy = mvy & 15
    x0 = x + ix + margin - 3
    y0 = y + iy + margin - 3
    win = jax.lax.dynamic_slice(ref_pad, (y0, x0), (hh + 7, s + 7))
    win = win.astype(jnp.int32)
    th = jnp.asarray(_TAPS_L)[fx]
    tv = jnp.asarray(_TAPS_L)[fy]
    tmp = jnp.zeros((hh + 7, s), jnp.int32)
    for t in range(8):
        tmp = tmp + th[t] * jax.lax.dynamic_slice_in_dim(win, t, s, axis=1)
    acc = jnp.zeros((hh, s), jnp.int32)
    for t in range(8):
        acc = acc + tv[t] * jax.lax.dynamic_slice_in_dim(tmp, t, hh, axis=0)
    return jnp.clip((acc + 2048) >> 12, 0, (1 << bd) - 1)


_DMVR_OFFS = np.asarray([(dx, dy) for dy in range(-2, 3)
                         for dx in range(-2, 3)], np.int32)


def dmvr_offset_j(ref0_pad, ref1_pad, x, y, sub: int, m0x, m0y, m1x, m1y,
                  margin: int = REF_MARGIN):
    """Device twin of spec.inter.dmvr_offset: best mirrored integer offset
    (dx, dy) by 25-point SAD on integer-aligned windows; jnp.argmin picks
    the first minimum, matching the spec's strict-less row-major scan."""
    r = 2
    x00 = x + (m0x >> MV_FRAC_BITS) + margin - r
    y00 = y + (m0y >> MV_FRAC_BITS) + margin - r
    x10 = x + (m1x >> MV_FRAC_BITS) + margin - r
    y10 = y + (m1y >> MV_FRAC_BITS) + margin - r
    w0 = jax.lax.dynamic_slice(ref0_pad, (y00, x00),
                               (sub + 2 * r, sub + 2 * r)).astype(jnp.int32)
    w1 = jax.lax.dynamic_slice(ref1_pad, (y10, x10),
                               (sub + 2 * r, sub + 2 * r)).astype(jnp.int32)
    costs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            a = w0[r + dy:r + dy + sub, r + dx:r + dx + sub]
            b = w1[r - dy:r - dy + sub, r - dx:r - dx + sub]
            sad = jnp.abs(a - b).sum()
            if dy == 0 and dx == 0:
                sad = sad - (sad >> 2)
            costs.append(sad)
    k = jnp.argmin(jnp.stack(costs))
    off = jnp.asarray(_DMVR_OFFS)[k]
    return off[0], off[1]


def _floor_log2_j(v):
    out = jnp.zeros_like(v)
    for k in range(1, 21):
        out = out + ((v >> k) > 0).astype(v.dtype)
    return out


def bdof_blend_j(p0e, p1e, bd: int):
    """Device twin of spec.inter.bdof_blend on (s+2, s+2) ring-extended
    predictions (identical integer formulas; see the spec docstring)."""
    s = p0e.shape[0] - 2
    p0 = p0e[1:-1, 1:-1].astype(jnp.int32)
    p1 = p1e[1:-1, 1:-1].astype(jnp.int32)
    gx0 = (p0e[1:-1, 2:].astype(jnp.int32) - p0e[1:-1, :-2]) >> 1
    gy0 = (p0e[2:, 1:-1].astype(jnp.int32) - p0e[:-2, 1:-1]) >> 1
    gx1 = (p1e[1:-1, 2:].astype(jnp.int32) - p1e[1:-1, :-2]) >> 1
    gy1 = (p1e[2:, 1:-1].astype(jnp.int32) - p1e[:-2, 1:-1]) >> 1
    diff = p1 - p0
    th = gx0 + gx1
    tv = gy0 + gy1

    def sum44(a):
        return a.reshape(s // 4, 4, s // 4, 4).sum(axis=(1, 3))

    def vcomp(sg, sdi):
        fl = _floor_log2_j(jnp.maximum(sg, 1))
        mag = jax.lax.shift_right_logical(jnp.abs(sdi) << 5, fl)
        v = -jnp.sign(sdi) * mag
        clip = jnp.clip(v, -31, 31)      # BDOF_CLIP
        return jnp.where(sg > 0, clip, 0)

    vx = jnp.repeat(jnp.repeat(vcomp(sum44(jnp.abs(th)),
                                     sum44(diff * jnp.sign(th))), 4, 0),
                    4, 1)
    vy = jnp.repeat(jnp.repeat(vcomp(sum44(jnp.abs(tv)),
                                     sum44(diff * jnp.sign(tv))), 4, 0),
                    4, 1)
    b = (vx * (gx0 - gx1) + vy * (gy0 - gy1) + 32) >> 6
    return jnp.clip(((p0 + p1 + 1) >> 1) + b, 0, (1 << bd) - 1)


def mc_chroma_block(ref_pad, x, y, s: int, mvx, mvy, bd: int = 8,
                    margin: int = REF_MARGIN // 2, h: int | None = None):
    hh = s if h is None else h
    ix = mvx >> 5
    iy = mvy >> 5
    fx = mvx & 31
    fy = mvy & 31
    x0 = x + ix + margin - 1
    y0 = y + iy + margin - 1
    win = jax.lax.dynamic_slice(ref_pad, (y0, x0), (hh + 3, s + 3))
    win = win.astype(jnp.int32)
    th = jnp.asarray(_TAPS_C)[fx]
    tv = jnp.asarray(_TAPS_C)[fy]
    tmp = jnp.zeros((hh + 3, s), jnp.int32)
    for t in range(4):
        tmp = tmp + th[t] * jax.lax.dynamic_slice_in_dim(win, t, s, axis=1)
    acc = jnp.zeros((hh, s), jnp.int32)
    for t in range(4):
        acc = acc + tv[t] * jax.lax.dynamic_slice_in_dim(tmp, t, hh, axis=0)
    return jnp.clip((acc + 2048) >> 12, 0, (1 << bd) - 1)


# ---------------------------------------------------------------------------
# Affine (4-parameter) + PROF — device twin of spec/inter.py affine_pred_*
# (per-4x4-subblock translational MC at the model MV, vmapped over the
# subblock grid; PROF per-pixel gradient correction in the recon path).
# ---------------------------------------------------------------------------
# numpy (not jnp): module import may first happen inside a jit trace, and
# a module-level jnp constant created there would leak a tracer
_PROF_D_NP = (2 * np.arange(4) - 3).astype(np.int32)


def affine_pred_luma_j(ref_pad, x, y, s: int, mvx0, mvy0, dmx, dmy,
                       bd: int = 8, prof: bool = True,
                       margin: int = REF_MARGIN):
    """(s, s) affine luma prediction; traced CPMV0 (mvx0, mvy0) and
    dmv = CPMV1 - CPMV0 (dmx, dmy), all 1/16-pel."""
    log2s = int(s).bit_length() - 1
    n = s // 4
    mx = (1 << bd) - 1
    prof_d = jnp.asarray(_PROF_D_NP)
    du = prof_d[None, :]
    dv = prof_d[:, None]
    dx32 = (dmx * du - dmy * dv) >> log2s
    dy32 = (dmy * du + dmx * dv) >> log2s

    def sub(k):
        i, j = k // n, k % n
        cx = 4 * j + 2
        cy = 4 * i + 2
        mvx = mvx0 + ((dmx * cx - dmy * cy) >> log2s)
        mvy = mvy0 + ((dmy * cx + dmx * cy) >> log2s)
        if prof:
            p = mc_luma_block(ref_pad, x + 4 * j - 1, y + 4 * i - 1, 6,
                              mvx, mvy, bd, margin)
            gx = (p[1:5, 2:6] - p[1:5, 0:4]) >> 1
            gy = (p[2:6, 1:5] - p[0:4, 1:5]) >> 1
            di = (gx * dx32 + gy * dy32 + 16) >> 5
            return jnp.clip(p[1:5, 1:5] + di, 0, mx)
        return mc_luma_block(ref_pad, x + 4 * j, y + 4 * i, 4, mvx, mvy,
                             bd, margin)

    blocks = jax.vmap(sub)(jnp.arange(n * n, dtype=jnp.int32))
    return blocks.reshape(n, n, 4, 4).transpose(0, 2, 1, 3).reshape(s, s)


def affine_pred_chroma_j(ref_pad, cx0, cy0, cs: int, mvx0, mvy0, dmx, dmy,
                         s_luma: int, bd: int = 8,
                         margin: int = REF_MARGIN // 2):
    """(cs, cs) affine chroma prediction: 4x4 subblocks at the luma
    granule-centre model MVs."""
    log2s = int(s_luma).bit_length() - 1
    n = cs // 4

    def sub(k):
        i, j = k // n, k % n
        cx = 8 * j + 4
        cy = 8 * i + 4
        mvx = mvx0 + ((dmx * cx - dmy * cy) >> log2s)
        mvy = mvy0 + ((dmy * cx + dmx * cy) >> log2s)
        return mc_chroma_block(ref_pad, cx0 + 4 * j, cy0 + 4 * i, 4,
                               mvx, mvy, bd, margin)

    blocks = jax.vmap(sub)(jnp.arange(n * n, dtype=jnp.int32))
    return blocks.reshape(n, n, 4, 4).transpose(0, 2, 1, 3).reshape(cs, cs)


def affine_granule_mvs_j(mvx0, mvy0, dmx, dmy, s: int):
    """(s//8, s//8, 2) model MVs at the 8x8-granule centres (int32)."""
    log2s = int(s).bit_length() - 1
    n = s // 8
    jj = 8 * jnp.arange(n, dtype=jnp.int32) + 4
    ii = 8 * jnp.arange(n, dtype=jnp.int32) + 4
    cx = jj[None, :]
    cy = ii[:, None]
    mvx = mvx0 + ((dmx * cx - dmy * cy) >> log2s)
    mvy = mvy0 + ((dmy * cx + dmx * cy) >> log2s)
    return jnp.stack([mvx, mvy], axis=-1)
