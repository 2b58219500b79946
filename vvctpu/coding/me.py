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

from ..spec.inter import ME_EXT, ME_RANGE, REF_MARGIN, mv_bits_est

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

# ME aggregation keys: square sizes by int, rect (BT) shapes by (w, h),
# TT stripe geometries by string key (spec.decide.TT_GEOM strides/offsets);
# factors are (fx, fy) multiples of the 8x8 base SAD grid
_ME_KEYS = (8, 16, 32, (16, 8), (8, 16), (32, 16), (16, 32))
_ME_FACT = {8: (1, 1), 16: (2, 2), 32: (4, 4), (16, 8): (2, 1),
            (8, 16): (1, 2), (32, 16): (4, 2), (16, 32): (2, 4)}
# TT keys: (block granules gh, gw; stride granules gsy, gsx; offset gy0, gx0)
_TT_KEYS = ((32, 8), (8, 32), "tth_mid", "ttv_mid")
_TT_AGG = {(32, 8): (1, 4, 1, 4, 0, 0),
           (8, 32): (4, 1, 4, 1, 0, 0),
           "tth_mid": (2, 4, 4, 4, 1, 0),
           "ttv_mid": (4, 2, 4, 4, 0, 1)}


def _tt_shape(key, n8y, n8x):
    gh, gw, gsy, gsx, gy0, gx0 = _TT_AGG[key]
    return ((n8y - gy0 - gh) // gsy + 1, (n8x - gx0 - gw) // gsx + 1)


def _tt_aggr(sad8, key, n8y, n8x):
    gh, gw, gsy, gsx, gy0, gx0 = _TT_AGG[key]
    nby, nbx = _tt_shape(key, n8y, n8x)
    out = jnp.zeros((nby, nbx), sad8.dtype)
    for gr in range(gh):
        for gc in range(gw):
            out = out + jax.lax.slice(
                sad8, (gy0 + gr, gx0 + gc),
                (gy0 + gr + (nby - 1) * gsy + 1,
                 gx0 + gc + (nbx - 1) * gsx + 1), (gsy, gsx))
    return out


def me_pass(orig, refp80, lam, *, frame_w: int, frame_h: int,
            tt: bool = False, ext: bool = True):
    """Integer ME for all square sizes + BT rect shapes (+ TT stripe
    geometries when ``tt``) at once: dense +-ME_RANGE full search widened
    to +-ME_EXT by the coarse-to-fine stage (twin of spec me_size_pass +
    _me_ext_pass).

    orig: (H, W) int32; refp80: (H+2*REF_MARGIN, ...) edge-padded
    reference (the device-resident DPB plane).  Returns dict key ->
    (cost (nby, nbx), mv int32 (nby, nbx, 2)).

    VVCTPU_PALLAS_ME=1 routes the dense stage through the Pallas kernel
    (kernels/me_pallas.py, bit-identical — tests/test_me_pallas.py);
    the XLA scan stays the default: measured 0.61 s vs 0.86 s per 1080p
    reference on v5e (see PALLAS.md for the analysis)."""
    import os
    keys = _ME_KEYS + (_TT_KEYS if tt else ())
    if os.environ.get("VVCTPU_PALLAS_ME") and not ext:
        return {k: v for k, v in zip(keys, me_pass_pallas_dense(
            orig, refp80, lam, frame_w=frame_w, frame_h=frame_h, tt=tt))}
    res = _me_pass_impl(orig, refp80, lam, frame_w=frame_w,
                        frame_h=frame_h, tt=tt, ext=ext)
    return {k: res[i] for i, k in enumerate(keys)}


def me_pass_pallas_dense(orig, refp80, lam, *, frame_w: int, frame_h: int,
                         tt: bool = False, interpret: bool = False):
    """Dense stage via the Pallas kernel: returns the same per-key
    (cost, mv) tuples as _me_pass_impl(ext=False), bit-identical."""
    import jax.numpy as jnp

    from ..kernels import me_pallas
    keys = _ME_KEYS + (_TT_KEYS if tt else ())
    c16 = REF_MARGIN - ME_RANGE
    refp = jax.lax.slice(
        refp80, (c16, c16), (c16 + frame_h + 2 * ME_RANGE,
                             c16 + frame_w + 2 * ME_RANGE))
    outs = me_pallas.me_sad_pallas(orig, refp, lam, frame_h=frame_h,
                                   frame_w=frame_w, keys=keys,
                                   interpret=interpret)
    return tuple((c, jnp.stack([dx, dy], -1)) for (c, dx, dy) in outs)


_ME_BATCH = 16          # offsets per scan step (vmapped; latency lever)


@functools.partial(jax.jit, static_argnames=("frame_w", "frame_h", "tt",
                                             "ext"))
def _me_pass_impl(orig, refp80, lam, *, frame_w: int, frame_h: int,
                  tt: bool = False, ext: bool = True):
    h, w = frame_h, frame_w
    n8y, n8x = h // 8, w // 8
    c16 = REF_MARGIN - ME_RANGE
    refp = jax.lax.slice(refp80, (c16, c16),
                         (c16 + h + 2 * ME_RANGE, c16 + w + 2 * ME_RANGE))
    # batch the offset grid: each scan step evaluates _ME_BATCH offsets
    # vmapped, with a first-min argmin inside the batch (batch rows are in
    # row-major offset order, so first-min == the sequential strict-less
    # tie-break).  Tail padded by repeating the last offset (equal costs
    # keep the earlier copy — result unchanged).
    n_off = _OFFSETS.shape[0]
    pad = (-n_off) % _ME_BATCH
    offs_np = np.concatenate(
        [_OFFSETS, np.tile(_OFFSETS[-1:], (pad, 1))]).reshape(
            -1, _ME_BATCH, 3)
    offs = jnp.asarray(offs_np)
    lam = jnp.asarray(lam, jnp.int32)
    keys = _ME_KEYS + (_TT_KEYS if tt else ())

    def aggr(c, key):
        if key in _TT_AGG:
            return _tt_aggr(c, key, n8y, n8x)
        fx, fy = _ME_FACT[key]
        return c.reshape(c.shape[0] // fy, fy,
                         c.shape[1] // fx, fx).sum((1, 3))

    def init(ny, nx):
        return (jnp.full((ny, nx), I32MAX, jnp.int32),
                jnp.zeros((ny, nx), jnp.int32),
                jnp.zeros((ny, nx), jnp.int32))

    def shape_of(k):
        if k in _TT_AGG:
            return _tt_shape(k, n8y, n8x)
        fx, fy = _ME_FACT[k]
        return (h // (8 * fy), w // (8 * fx))

    carry0 = tuple(init(*shape_of(k)) for k in keys)
    orig32 = orig.astype(jnp.int32)

    def body(carry, offb):
        def sad_one(off):
            win = jax.lax.dynamic_slice(
                refp, (ME_RANGE + off[0], ME_RANGE + off[1]), (h, w))
            d = jnp.abs(orig32 - win.astype(jnp.int32))
            return d.reshape(n8y, 8, n8x, 8).sum((1, 3))

        sad8b = jax.vmap(sad_one)(offb)              # (B, n8y, n8x)
        out = []
        for i, k in enumerate(keys):
            sb = jax.vmap(lambda c: aggr(c, k))(sad8b)
            cb = (sb << 8) + lam * offb[:, 2, None, None]
            bi = jnp.argmin(cb, axis=0)              # first-min in order
            c = jnp.take_along_axis(cb, bi[None], 0)[0]
            dxv = offb[:, 1][bi]
            dyv = offb[:, 0][bi]
            cost, bx, by = carry[i]
            better = c < cost
            out.append((jnp.where(better, c, cost),
                        jnp.where(better, dxv, bx),
                        jnp.where(better, dyv, by)))
        return tuple(out), None

    carry, _ = jax.lax.scan(body, carry0, offs)
    if not ext:
        return tuple((carry[i][0],
                      jnp.stack([carry[i][1], carry[i][2]], -1))
                     for i in range(len(keys)))

    # ---- extended range: coarse (4x-decimated full search over
    # +-ME_EXT/4) -> fine (5x5 full-res window around 4x the coarse
    # winner); strictly-cheaper candidates replace the dense winner
    # (twin of spec _me_ext_pass; identical candidate order/tie-breaks).
    rc = ME_EXT // 4
    c64 = REF_MARGIN - ME_EXT
    od = jax.lax.slice(orig.astype(jnp.int32), (0, 0), (h, w), (4, 4))
    rd = jax.lax.slice(refp80, (c64, c64),
                       (c64 + h + 2 * ME_EXT, c64 + w + 2 * ME_EXT),
                       (4, 4))
    hd, wd = h // 4, w // 4
    n2y, n2x = hd // 2, wd // 2

    coffs_np = np.asarray([(dy, dx) for dy in range(-rc, rc + 1)
                           for dx in range(-rc, rc + 1)], np.int32)
    cpad = (-coffs_np.shape[0]) % _ME_BATCH
    coffs = jnp.asarray(np.concatenate(
        [coffs_np, np.tile(coffs_np[-1:], (cpad, 1))]).reshape(
            -1, _ME_BATCH, 2))

    ekeys = (8, 16, 32)   # ext stage: square sizes only (twin of spec
    # me_size_pass's bh-is-None gate; rect/TT leaves keep the dense range)
    ccarry0 = tuple(init(*shape_of(k)) for k in ekeys)

    def cbody(carry, offb):
        def sad_one(off):
            win = jax.lax.dynamic_slice(rd, (rc + off[0], rc + off[1]),
                                        (hd, wd))
            d = jnp.abs(od - win.astype(jnp.int32))
            return d.reshape(n2y, 2, n2x, 2).sum((1, 3))

        sad2b = jax.vmap(sad_one)(offb)        # ds 2x2 == full-res 8x8
        out = []
        for i, k in enumerate(ekeys):
            sb = jax.vmap(lambda c: aggr(c, k))(sad2b)
            bi = jnp.argmin(sb, axis=0)
            cmin = jnp.take_along_axis(sb, bi[None], 0)[0]
            dxv = offb[:, 1][bi]
            dyv = offb[:, 0][bi]
            cost, bx, by = carry[i]
            better = cmin < cost
            out.append((jnp.where(better, cmin, cost),
                        jnp.where(better, dxv, bx),
                        jnp.where(better, dyv, by)))
        return tuple(out), None

    ccarry, _ = jax.lax.scan(cbody, ccarry0, coffs)

    re2 = ME_EXT + 2
    cre = REF_MARGIN - re2
    refe = jax.lax.slice(refp80, (cre, cre),
                         (cre + h + 2 * re2, cre + w + 2 * re2))
    orig32 = orig.astype(jnp.int32)

    def fine_for_key(k, coarse):
        _, cdx, cdy = coarse
        if k in _TT_AGG:
            gh, gw, gsy, gsx, gy0, gx0 = _TT_AGG[k]
            bw_, bh_ = gw * 8, gh * 8
            sy_, sx_, oy_, ox_ = gsy * 8, gsx * 8, gy0 * 8, gx0 * 8
        else:
            fx, fy = _ME_FACT[k]
            bw_, bh_ = fx * 8, fy * 8
            sy_, sx_, oy_, ox_ = bh_, bw_, 0, 0
        nby, nbx = cdx.shape
        ys = jnp.arange(nby, dtype=jnp.int32) * sy_ + oy_
        xs = jnp.arange(nbx, dtype=jnp.int32) * sx_ + ox_
        gx, gy = jnp.meshgrid(xs, ys)
        coords = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
        bdx = (cdx * 4).ravel()
        bdy = (cdy * 4).ravel()

        def one(xy, bx, by):
            # ONE (bh+4, bw+4) window gather per block; the 25 delta
            # candidates are static in-window slices (a per-delta
            # dynamic_slice made the fine stage the decide bottleneck:
            # 86 s/9 frames at 1080p before this restructure)
            ob = jax.lax.dynamic_slice(orig32, (xy[1], xy[0]), (bh_, bw_))
            win = jax.lax.dynamic_slice(
                refe, (xy[1] + re2 + by - 2, xy[0] + re2 + bx - 2),
                (bh_ + 4, bw_ + 4))
            cost = jnp.int32(I32MAX)
            odx = jnp.int32(0)
            ody = jnp.int32(0)
            for ddy in range(-2, 3):
                for ddx in range(-2, 3):
                    dx = bx + ddx
                    dy = by + ddy
                    rb = win[2 + ddy:2 + ddy + bh_, 2 + ddx:2 + ddx + bw_]
                    sad = jnp.abs(ob - rb).sum()
                    bits = 2 + 2 * _bitlen(dx) + 2 * _bitlen(dy)
                    c = (sad << 8) + lam.astype(jnp.int32) * bits
                    better = c < cost
                    cost = jnp.where(better, c, cost)
                    odx = jnp.where(better, dx, odx)
                    ody = jnp.where(better, dy, ody)
            return cost, odx, ody

        fc, fdx, fdy = jax.vmap(one)(coords, bdx, bdy)
        return (fc.reshape(nby, nbx), fdx.reshape(nby, nbx),
                fdy.reshape(nby, nbx))

    out = []
    for i, k in enumerate(keys):
        dcost, ddx, ddy = carry[i]
        if k in ekeys:
            fc, fdx, fdy = fine_for_key(k, ccarry[ekeys.index(k)])
            better = fc < dcost
            dcost = jnp.where(better, fc, dcost)
            ddx = jnp.where(better, fdx, ddx)
            ddy = jnp.where(better, fdy, ddy)
        out.append((dcost, jnp.stack([ddx, ddy], -1)))
    return tuple(out)


def ibc_pass(orig, lam, *, frame_w: int, frame_h: int, ibc_fp=None):
    """Full-search IBC block-vector pass for sizes 8/16/32 at once — twin
    of spec ibc_size_pass (same window, candidate order, legality and
    strict-less min).  Returns dict size -> (cost int32, bv (nby,nbx,2))."""
    if ibc_fp is None:
        from ..spec.codec import IBC_BITS
        ibc_fp = np.int32(IBC_BITS << 8)
    res = _ibc_pass_impl(orig, lam, jnp.asarray(ibc_fp, jnp.int32),
                         frame_w=frame_w, frame_h=frame_h)
    return {s: res[i] for i, s in enumerate((8, 16, 32))}


def _ibc_offsets() -> np.ndarray:
    from ..spec.decide import IBC_WIN
    from ..spec.inter import mv_bits_q
    rows = []
    for dy in range(-IBC_WIN, 1):
        for dx in range(-IBC_WIN, IBC_WIN + 1):
            rows.append((dy, dx, mv_bits_q(dx, dy)))
    return np.asarray(rows, np.int32)


@functools.partial(jax.jit, static_argnames=("frame_w", "frame_h"))
def _ibc_pass_impl(orig, lam, ibc_fp, *, frame_w: int, frame_h: int):
    from ..spec.decide import IBC_WIN
    h, w = frame_h, frame_w
    n8y, n8x = h // 8, w // 8
    lam = jnp.asarray(lam, jnp.int32)
    refp = jnp.pad(orig.astype(jnp.int32), IBC_WIN, mode="edge")

    grids = {}
    for s in (8, 16, 32):
        X, Y = np.meshgrid(np.arange(w // s, dtype=np.int32) * s,
                           np.arange(h // s, dtype=np.int32) * s)
        grids[s] = (jnp.asarray(X), jnp.asarray(Y),
                    jnp.asarray(Y & ~63), jnp.asarray(X & ~63))

    def aggr(c, f):
        return c.reshape(c.shape[0] // f, f, c.shape[1] // f, f).sum((1, 3))

    def init(s):
        ny, nx = h // s, w // s
        return (jnp.full((ny, nx), I32MAX, jnp.int32),
                jnp.zeros((ny, nx), jnp.int32),
                jnp.zeros((ny, nx), jnp.int32))

    carry0 = tuple(init(s) for s in (8, 16, 32))

    # batched offsets, first-min argmin in offset order (see _me_pass_impl)
    offs_np = _ibc_offsets()
    pad = (-offs_np.shape[0]) % _ME_BATCH
    offs = jnp.asarray(np.concatenate(
        [offs_np, np.tile(offs_np[-1:], (pad, 1))]).reshape(
            -1, _ME_BATCH, 3))
    orig32 = orig.astype(jnp.int32)

    def body(carry, offb):
        def sad_one(off):
            win = jax.lax.dynamic_slice(
                refp, (IBC_WIN + off[0], IBC_WIN + off[1]), (h, w))
            d = jnp.abs(orig32 - win)
            return d.reshape(n8y, 8, n8x, 8).sum((1, 3))

        sad8b = jax.vmap(sad_one)(offb)
        sadsb = {8: sad8b,
                 16: jax.vmap(lambda c: aggr(c, 2))(sad8b),
                 32: jax.vmap(lambda c: aggr(c, 4))(sad8b)}
        dxb = offb[:, 1][:, None, None]
        dyb = offb[:, 0][:, None, None]
        out = []
        for i, s in enumerate((8, 16, 32)):
            X, Y, cy0, cx0 = grids[s]
            sx, sy = X[None] + dxb, Y[None] + dyb
            legal = ((sx >= 0) & (sy >= 0) & (sx + s <= w) & (sy + s <= h)
                     & (((sy + s) <= cy0[None])
                        | ((sy >= cy0[None]) & ((sy + s) <= cy0[None] + 64)
                           & ((sx + s) <= cx0[None]))))
            cb = ((sadsb[s] << 8) + lam * offb[:, 2, None, None]
                  + ((ibc_fp * lam) >> 8))
            cb = jnp.where(legal, cb, I32MAX)
            bi = jnp.argmin(cb, axis=0)
            c = jnp.take_along_axis(cb, bi[None], 0)[0]
            dxv = offb[:, 1][bi]
            dyv = offb[:, 0][bi]
            cost, bx, by = carry[i]
            better = c < cost
            out.append((jnp.where(better, c, cost),
                        jnp.where(better, dxv, bx),
                        jnp.where(better, dyv, by)))
        return tuple(out), None

    carry, _ = jax.lax.scan(body, carry0, offs)
    return tuple((carry[i][0], jnp.stack([carry[i][1], carry[i][2]], -1))
                 for i in range(3))


def _bitlen(v):
    """Threshold-sum integer bit length (== spec.inter.bitlen_int)."""
    v = jnp.abs(v)
    return sum((v >= (1 << k)).astype(jnp.int32) for k in range(15))


def _mv_bits_q(mvx_q, mvy_q):
    return 2 + 2 * _bitlen(mvx_q) + 2 * _bitlen(mvy_q)


@functools.partial(jax.jit, static_argnames=("bd",))
def quarter_phase_planes(refp_margin, bd: int = 8):
    """(16, Hp, Wp) int32 stack of the reference interpolated at every
    quarter-pel phase (fy, fx) in {0,4,8,12}^2, plane index
    (fy >> 2) * 4 + (fx >> 2).

    Per-pixel identical to kernels/mc.mc_luma_block's two-stage FIR
    (same taps, accumulation order, (acc + 2048) >> 12 staging), so a
    (hh, s) slice of plane p at (y + iy, x + ix) IS mc_luma_block(ref,
    x, y, mv) for mv = ((ix << 4) | fx, (iy << 4) | fy).  Border rows/
    cols within the filter footprint hold wrap garbage — never read,
    the MC clamp keeps blocks >= 8 px inside the 80-px margin."""
    from ..kernels.mc import _TAPS_L
    r32 = refp_margin.astype(jnp.int32)
    tmps = []
    for fx in (0, 4, 8, 12):
        th = np.asarray(_TAPS_L[fx])
        tmps.append(sum(int(th[u]) * jnp.roll(r32, 3 - u, axis=1)
                        for u in range(8)))
    planes = []
    for fy in (0, 4, 8, 12):
        tv = np.asarray(_TAPS_L[fy])
        for tmp in tmps:
            acc = sum(int(tv[t]) * jnp.roll(tmp, 3 - t, axis=0)
                      for t in range(8))
            planes.append(jnp.clip((acc + 2048) >> 12, 0, (1 << bd) - 1))
    return jnp.stack(planes)


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd", "bh", "sy", "sx", "oy",
                                             "ox"))
def refine_pass(orig, refp_margin, int_mv, lam, *, s: int, frame_w: int,
                frame_h: int, bd: int = 8, bh: int | None = None,
                sy: int | None = None, sx: int | None = None,
                oy: int = 0, ox: int = 0, planes=None):
    """Half/quarter-pel refinement (twin of spec refine_size_pass).

    refp_margin: REF_MARGIN-padded reference; int_mv: (nby, nbx, 2) int.
    s is the block width, bh the height (default square); blocks tile at
    stride (sy, sx) from offset (oy, ox) (defaults dense — TT stripes use
    the TT_GEOM strides).
    Returns (cost int32, mv_1_16 int32 (nby, nbx, 2)).

    Round-5 restructure: candidate predictions are (hh, s) slices of the
    16 quarter-pel phase planes (quarter_phase_planes — per-pixel equal
    to the old per-block mc_luma_block FIR, bit-identical results); the
    per-block per-delta work drops from a (hh+7, s+7) gather + 16-tap
    FIR to one (hh, s) gather.  ``planes`` lets the caller share the
    stack across the per-size calls."""
    from ..spec.inter import MV_FRAC_BITS, REF_MARGIN
    from ..spec.inter import (REFINE_HALF, REFINE_QUARTER)
    h, w = frame_h, frame_w
    hh = s if bh is None else bh
    sy = hh if sy is None else sy
    sx = s if sx is None else sx
    nby = (h - oy - hh) // sy + 1
    nbx = (w - ox - s) // sx + 1
    xs = jnp.arange(nbx, dtype=jnp.int32) * sx + ox
    ys = jnp.arange(nby, dtype=jnp.int32) * sy + oy
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    lam = jnp.asarray(lam, jnp.int32)
    orig = orig.astype(jnp.int32)
    if planes is None:
        planes = quarter_phase_planes(refp_margin, bd)
    Hp, Wp = planes.shape[1], planes.shape[2]
    P4 = planes.reshape(4, 4, Hp, Wp)

    def sh2(fyi, fxi):
        # plane whose [y + iy, x + ix] entry is the prediction at phase
        # (4*fyi, 4*fxi) quarter steps from the (iy, ix)-integer centre:
        # negative/overflow phases fold into the neighbouring integer
        # sample, absorbed here as a plane roll
        qy, ry = divmod(4 * fyi, 16)
        qx, rx = divmod(4 * fxi, 16)
        pl = P4[ry >> 2, rx >> 2]
        if qy:
            pl = jnp.roll(pl, -qy, axis=0)
        if qx:
            pl = jnp.roll(pl, -qx, axis=1)
        return pl

    # all 9 half-pel candidates start from phase (0, 0), so their planes
    # are static: one (9, hh, s) gather per block covers the whole stage
    half_stack = jnp.stack([sh2(fy, fx) for fy in (-2, 0, 2)
                            for fx in (-2, 0, 2)])
    # quarter stage: centre phase in {0, 8} per axis, candidates +-1
    # quarter step -> a (3, 3) window of the extended (5, 5) phase grid
    qext = jnp.stack([jnp.stack([sh2(fy, fx) for fx in range(-1, 4)])
                      for fy in range(-1, 4)])

    best_mv = (int_mv.reshape(-1, 2) << MV_FRAC_BITS).astype(jnp.int32)

    def run_stage(stack4d, deltas, step, mv):
        quarter = stack4d.ndim == 4

        def one(xy, mvx, mvy):
            ix = mvx >> MV_FRAC_BITS
            iy = mvy >> MV_FRAC_BITS
            y0 = xy[1] + iy + REF_MARGIN
            x0 = xy[0] + ix + REF_MARGIN
            if quarter:
                pyi = (mvy & 15) >> 2
                pxi = (mvx & 15) >> 2
                win = jax.lax.dynamic_slice(
                    qext, (pyi, pxi, y0, x0), (3, 3, hh, s))
            else:
                win = jax.lax.dynamic_slice(
                    half_stack, (0, y0, x0), (9, hh, s))
            blk = jax.lax.dynamic_slice(orig, (xy[1], xy[0]), (hh, s))
            cost = jnp.int32(I32MAX)
            bdx = jnp.int32(0)
            bdy = jnp.int32(0)
            for (ddx, ddy) in deltas:
                a = ddy // step + 1
                b = ddx // step + 1
                pred = win[a, b] if quarter else win[a * 3 + b]
                sad = jnp.abs(blk - pred).sum()
                c = ((sad << 8)
                     + lam * _mv_bits_q((mvx + ddx) >> 2,
                                        (mvy + ddy) >> 2))
                better = c < cost
                cost = jnp.where(better, c, cost)
                bdx = jnp.where(better, ddx, bdx)
                bdy = jnp.where(better, ddy, bdy)
            return cost, bdx, bdy

        cost, bdx, bdy = jax.vmap(one)(coords, mv[:, 0], mv[:, 1])
        return cost, mv + jnp.stack([bdx, bdy], axis=-1)

    _, best_mv = run_stage(half_stack, REFINE_HALF, 8, best_mv)
    cost, best_mv = run_stage(qext, REFINE_QUARTER, 4, best_mv)
    return (cost.reshape(nby, nbx),
            best_mv.reshape(nby, nbx, 2))


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd", "bcw", "bh", "sy", "sx",
                                             "oy", "ox"))
def bi_cost_pass(orig, refp0, refp1, mv0, mv1, lam, bcw_fp=None, *, s: int,
                 frame_w: int, frame_h: int, bd: int = 8, bcw: bool = False,
                 bh: int | None = None, sy: int | None = None,
                 sx: int | None = None, oy: int = 0, ox: int = 0,
                 planes0=None, planes1=None):
    """BI cost per s-block: SAD of the averaged refined uni predictions plus
    both quarter-pel MV rates (twin of the numpy loop in decide_frame_b).

    With ``bcw``, each of the three {3,4,5}/8 weighted averages is costed
    (+ its bcw_idx rate) and the winner index returned alongside the cost.
    Blocks tile at stride (sy, sx) from offset (oy, ox) (defaults dense).
    Returns (cost, widx), both (nby, nbx)."""
    from ..kernels import mc as jmc
    from ..spec.inter import BCW_DEFAULT, BCW_IDX_BITS, BCW_W
    if bcw_fp is None:
        bcw_fp = jnp.asarray(np.asarray(BCW_IDX_BITS, np.int32) << 8)
    h, w = frame_h, frame_w
    hh = s if bh is None else bh
    sy = hh if sy is None else sy
    sx = s if sx is None else sx
    nby = (h - oy - hh) // sy + 1
    nbx = (w - ox - s) // sx + 1
    xs = jnp.arange(nbx, dtype=jnp.int32) * sx + ox
    ys = jnp.arange(nby, dtype=jnp.int32) * sy + oy
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    m0 = mv0.reshape(-1, 2)
    m1 = mv1.reshape(-1, 2)
    lam = jnp.asarray(lam, jnp.int32)
    mx = (1 << bd) - 1
    orig = orig.astype(jnp.int32)
    widxs = (0, 1, 2) if bcw else (BCW_DEFAULT,)

    from ..spec.inter import MV_FRAC_BITS as _FB
    from ..spec.inter import REF_MARGIN as _RM

    def pred_of(planes, refp, xy, m):
        if planes is None:
            return jmc.mc_luma_block(refp, xy[0], xy[1], s, m[0], m[1],
                                     bd, h=hh)
        # refined MVs are quarter-pel: one (hh, s) slice of the phase
        # plane == mc_luma_block bit-exactly (quarter_phase_planes)
        pidx = ((m[1] & 15) >> 2) * 4 + ((m[0] & 15) >> 2)
        return jax.lax.dynamic_slice(
            planes, (pidx, xy[1] + (m[1] >> _FB) + _RM,
                     xy[0] + (m[0] >> _FB) + _RM), (1, hh, s))[0]

    def one(xy, a, b):
        p0 = pred_of(planes0, refp0, xy, a)
        p1 = pred_of(planes1, refp1, xy, b)
        blk = jax.lax.dynamic_slice(orig, (xy[1], xy[0]), (hh, s))
        bits = (_mv_bits_q(a[0] >> 2, a[1] >> 2)
                + _mv_bits_q(b[0] >> 2, b[1] >> 2))
        cs = []
        for wi in widxs:
            wv = BCW_W[wi]
            pb = jnp.clip((wv * p0 + (8 - wv) * p1 + 4) >> 3, 0, mx)
            sad = jnp.abs(blk - pb).sum()
            wb = ((bcw_fp[wi] * lam) >> 8) if bcw else 0
            cs.append((sad << 8) + lam * bits + wb)
        cv = jnp.stack(cs)
        wi = jnp.argmin(cv).astype(jnp.int32)
        return cv[wi], (wi if bcw else jnp.int32(BCW_DEFAULT))

    cost, widx = jax.vmap(one)(coords, m0, m1)
    return cost.reshape(nby, nbx), widx.reshape(nby, nbx)
