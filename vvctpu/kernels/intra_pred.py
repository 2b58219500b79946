"""JAX intra prediction — device twin of spec/intra.py, integer bit-exact.

Single-block prediction with static size and traced mode, plus the reference
L-array construction from a margin-padded recon buffer with *geometric*
availability: a neighbouring sample is available iff its 8x8-granule Morton
index (global z-order coding position) precedes the current leaf's.  This is
exactly the order in which the spec model's dynamic ``valid`` map fills, so
both derivations agree; the JAX side needs no sequential mask state.

All arithmetic is int32 (int64 for planar accumulators is unnecessary at
BD<=10: products fit int32), with explicit shifts mirroring spec/intra.py.
Parity is enforced by tests/test_jax_parity.py over all 67 modes x sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom

MARGIN = 64  # right/bottom margin of the recon gather buffer

# numpy (not jnp) module constants: a first import inside a jit trace would
# otherwise capture tracers (see kernels/mc.py _PROF_D_NP)
_ANGLE = np.asarray(rom.INTRA_PRED_ANGLE, np.int32)
_INV_ANGLE = np.asarray(rom.INTRA_INV_ANGLE, np.int32)
_TAPS_SHARP = np.asarray(rom.intra_filter_4tap(False), np.int32)
_TAPS_SMOOTH = np.asarray(rom.intra_filter_4tap(True), np.int32)

_SMOOTH_THRES = np.asarray([64, 64, 64, 14, 2, 0, 0], np.int32)  # idx=log2s


# CTU geometry for the coding-order (z-index) availability proofs.  Set
# once per encode/decode via set_log2_ctu (pipeline entry points) — a
# module global read at TRACE time, so changing it must drop the jit
# caches (same pattern as core/tables_spec).  Default 64-CTU.
LOG2_CTU = 6


def set_log2_ctu(log2c: int) -> None:
    global LOG2_CTU
    if log2c == LOG2_CTU:
        return
    LOG2_CTU = log2c
    import sys
    jx = sys.modules.get("jax")
    if jx is not None:
        jx.clear_caches()


def morton8(x, y, n_ctu_x: int):
    """Global z-order index of the 8x8 granule containing luma pixel
    (x, y): CTU raster x z-order (QT recursion order) within the CTU.
    n_ctu_x must be the frame width in CTUs of the ACTIVE CTU size
    (frame_w >> LOG2_CTU)."""
    log2c = LOG2_CTU
    nb = log2c - 3
    ctu = (y >> log2c) * n_ctu_x + (x >> log2c)
    gx = (x >> 3) & ((1 << nb) - 1)
    gy = (y >> 3) & ((1 << nb) - 1)
    m = jnp.zeros_like(gx)
    for b in range(nb):
        m = m | (((gx >> b) & 1) << (2 * b)) | (((gy >> b) & 1) << (2 * b + 1))
    return ctu * (1 << (2 * nb)) + m


@functools.partial(jax.jit, static_argnames=("s", "is_luma", "frame_w",
                                             "frame_h", "n_ctu_x", "bd",
                                             "in_frame_only"))
def build_references(buf, x, y, *, s: int, is_luma: bool, frame_w: int,
                     frame_h: int, n_ctu_x: int, bd: int = 8,
                     in_frame_only: bool = False, ref_line=0, y_off=0):
    """Gather + substitute reference samples for a square s-block at (x, y).

    ``buf`` is the (frame_h + 1 + MARGIN, frame_w + 1 + MARGIN) recon buffer
    with a 1-sample top/left offset (buf[y+1, x+1] = plane[y, x]).
    Returns (top, left): int32 arrays of length 2s+1 (index 0 = corner).
    ref_line (traced, MRL) gathers the k-th further line, corner-aligned —
    twin of spec/intra.build_references(ref_line=k).
    """
    half = 1 << (bd - 1)
    n = 2 * s
    k = jnp.asarray(ref_line, jnp.int32)
    # raw gathers (offset +1 built into the buffer indexing).  A negative
    # start (y-k / x-k at the frame edge) must be clamped explicitly —
    # dynamic_slice would wrap it to the end — and the in-frame samples
    # shifted back by roll; the wrapped entries all have sy/sx < 0 and are
    # substituted away by the availability mask.
    ys0 = jnp.maximum(y - k, 0) + y_off   # y_off: frame-slab memory offset
    xs0 = jnp.maximum(x - k, 0)
    top_raw = jax.lax.dynamic_slice(buf, (ys0, xs0), (1, n + 1))[0]
    top_raw = jnp.roll(top_raw, jnp.maximum(k - x, 0))
    left_raw = jax.lax.dynamic_slice(buf, (ys0, xs0), (n + 1, 1))[:, 0]
    left_raw = jnp.roll(left_raw, jnp.maximum(k - y, 0))

    # L-scan order: left bottom-to-top (j = n..1), corner, top (i = 1..n)
    scan_vals = jnp.concatenate([left_raw[1:][::-1], top_raw])  # len 2n+1

    # availability of each scan sample, by geometry
    j_idx = jnp.arange(n, 0, -1)
    left_sx = jnp.full((n,), -1, jnp.int32) + x - k      # x - 1 - k
    left_sy = y - 1 - k + j_idx
    top_i = jnp.arange(0, n + 1)
    top_sx = x - 1 - k + top_i
    top_sy = jnp.full((n + 1,), -1, jnp.int32) + y - k   # y - 1 - k
    sx = jnp.concatenate([left_sx, top_sx])
    sy = jnp.concatenate([left_sy, top_sy])
    scale = 1 if is_luma else 2
    in_frame = (sx >= 0) & (sy >= 0) & (sx < frame_w) & (sy < frame_h)
    if in_frame_only:
        avail = in_frame
    else:
        cur = morton8(x * scale, y * scale, n_ctu_x)
        coded = morton8(jnp.maximum(sx, 0) * scale,
                        jnp.maximum(sy, 0) * scale, n_ctu_x) < cur
        avail = in_frame & coded

    # substitution: forward-fill from the first available sample
    idx = jnp.arange(2 * n + 1)
    last_avail = jax.lax.cummax(jnp.where(avail, idx, -1))
    first_avail = jnp.argmax(avail)
    src = jnp.where(last_avail >= 0, last_avail, first_avail)
    filled = scan_vals[src]
    any_avail = avail.any()
    filled = jnp.where(any_avail, filled, half).astype(jnp.int32)

    left = jnp.concatenate([filled[n:n + 1], filled[:n][::-1]])
    top = filled[n:]
    return top, left


# ---------------------------------------------------------------------------
# prediction (mirrors spec/intra.py arithmetic exactly)
# ---------------------------------------------------------------------------

def _smooth(top, left):
    def f(a):
        mid = (a[:-2] + 2 * a[1:-1] + a[2:] + 2) >> 2
        lastv = (a[-2] + 3 * a[-1] + 2) >> 2
        return jnp.concatenate([a[:1], mid, lastv[None]])
    corner = (left[1] + 2 * top[0] + top[1] + 2) >> 2
    tf = f(top).at[0].set(corner)
    lf = f(left).at[0].set(corner)
    return tf, lf


def _ref_filter_flag(mode, s: int):
    log2s = int(s).bit_length() - 1
    dist = jnp.minimum(jnp.abs(mode - rom.HOR_IDX),
                       jnp.abs(mode - rom.VER_IDX))
    is_special = (mode == rom.DC_IDX) | (mode == rom.HOR_IDX) | \
        (mode == rom.VER_IDX)
    planar_f = (mode == rom.PLANAR_IDX) & (s * s > 32)
    ang_f = (mode >= 2) & (dist > _SMOOTH_THRES[log2s])
    return jnp.where(is_special, False, planar_f | ang_f)


def _planar(top, left, s: int):
    lw = int(s).bit_length() - 1
    xs = jnp.arange(s, dtype=jnp.int32)
    ys = jnp.arange(s, dtype=jnp.int32)
    t = top[1:s + 1]
    l = left[1:s + 1]
    tr = top[s + 1]
    bl = left[s + 1]
    pv = (s - 1 - ys)[:, None] * t[None, :] + (ys + 1)[:, None] * bl
    ph = (s - 1 - xs)[None, :] * l[:, None] + (xs + 1)[None, :] * tr
    return ((pv << lw) + (ph << lw) + s * s) >> (2 * lw + 1)


def _dc(top, left, s: int):
    lsum = top[1:s + 1].sum() + left[1:s + 1].sum()
    v = (lsum + s) // (2 * s)
    return jnp.full((s, s), v, jnp.int32)


def _angular(top, left, mode, s: int, is_luma: bool, ref_line=0):
    angle = jnp.asarray(_ANGLE)[mode]
    inv_angle = jnp.asarray(_INV_ANGLE)[mode]
    vertical = mode >= rom.DIA_IDX
    main = jnp.where(vertical, top, left)
    side = jnp.where(vertical, left, top)

    n = s
    off = n
    # ext[off + i] = main[i] (i = 0..2s), tail clamp, plus side projection
    ext_len = 4 * s + 2
    i_main = jnp.clip(jnp.arange(ext_len) - off, 0, 2 * s)
    ext = main[i_main]
    k = off - jnp.arange(off)          # k = s..1 at ext positions 0..s-1
    sidx = jnp.clip((k * inv_angle + 256) >> 9, 0, 2 * s)
    proj = side[sidx]
    neg = angle < 0
    ext = ext.at[:off].set(jnp.where(neg, proj, ext[:off]))

    rl = jnp.asarray(ref_line, jnp.int32)
    ys = jnp.arange(1, s + 1, dtype=jnp.int32)
    pos = (ys + rl) * angle
    i_idx = pos >> 5
    i_fact = pos & 31
    xs = jnp.arange(s, dtype=jnp.int32)
    base = off + 1 + rl + xs[None, :] + i_idx[:, None]

    integer_slope = (angle % 32) == 0
    a = ext[jnp.clip(base, 0, ext_len - 1)]
    b = ext[jnp.clip(base + 1, 0, ext_len - 1)]
    two_tap = ((32 - i_fact)[:, None] * a + i_fact[:, None] * b + 16) >> 5

    if is_luma:
        filt = _ref_filter_flag(mode, s) & (rl == 0)
        taps = jnp.where(filt, jnp.asarray(_TAPS_SMOOTH)[i_fact], jnp.asarray(_TAPS_SHARP)[i_fact])
        four = jnp.zeros((s, s), jnp.int32)
        for t in range(4):
            four = four + taps[:, t][:, None] * ext[
                jnp.clip(base + t - 1, 0, ext_len - 1)]
        four = (four + 32) >> 6
        pred = jnp.where(integer_slope, a, four)
    else:
        pred = jnp.where(integer_slope, a, two_tap)

    return jnp.where(vertical, pred, pred.T)


def _pdpc(pred, top, left, mode, s: int, bd: int):
    scale = (2 * (int(s).bit_length() - 1) - 2) >> 2
    xs = jnp.arange(s, dtype=jnp.int32)
    wl = (32 >> jnp.minimum(31, (xs * 2) >> scale))[None, :]
    wt = (32 >> jnp.minimum(31, (xs * 2) >> scale))[:, None]
    t = top[1:s + 1][None, :]
    l = left[1:s + 1][:, None]
    corner = top[0]
    mx = (1 << bd) - 1
    plain = (wl * l + wt * t + (64 - wl - wt) * pred + 32) >> 6
    ver = jnp.clip(pred + ((wl * (l - corner) + 32) >> 6), 0, mx)
    hor = jnp.clip(pred + ((wt * (t - corner) + 32) >> 6), 0, mx)
    out = jnp.where((mode == rom.PLANAR_IDX) | (mode == rom.DC_IDX), plain,
                    jnp.where(mode == rom.VER_IDX, ver,
                              jnp.where(mode == rom.HOR_IDX, hor, pred)))
    return out


@functools.partial(jax.jit, static_argnames=("s", "is_luma", "bd"))
def predict(top, left, mode, *, s: int, is_luma: bool, bd: int = 8,
            ref_line=0):
    """Predict an (s, s) block.  top/left: (2s+1,) int32; mode traced.
    ref_line (traced, MRL): smoothing and PDPC gated off when > 0, angular
    ray intersection shifted — twin of spec/intra.predict(ref_line=k)."""
    mode = jnp.asarray(mode, jnp.int32)
    rl = jnp.asarray(ref_line, jnp.int32)
    if is_luma:
        filt = _ref_filter_flag(mode, s) & (rl == 0)
        angle = jnp.asarray(_ANGLE)[mode]
        smooth_now = filt & ((mode == rom.PLANAR_IDX) | ((angle % 32) == 0))
        ts, ls = _smooth(top, left)
        top_u = jnp.where(smooth_now, ts, top)
        left_u = jnp.where(smooth_now, ls, left)
    else:
        top_u, left_u = top, left

    # lax.switch: the sequential recon scan evaluates only the selected
    # family; under vmap (the all-mode decision pass) XLA lowers this to the
    # same select-all-branches as before — values are identical either way
    pred = jax.lax.switch(
        jnp.minimum(mode, 2),
        [lambda: _planar(top_u, left_u, s),
         lambda: _dc(top_u, left_u, s),
         lambda: _angular(top_u, left_u, jnp.maximum(mode, 2), s, is_luma,
                          rl)])
    if is_luma:
        pred = jnp.where(rl == 0,
                         _pdpc(pred, top_u, left_u, mode, s, bd), pred)
    return jnp.clip(pred, 0, (1 << bd) - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Rectangular-block prediction — device twin of spec/intra.py's (w, h) paths.
# Used by ISP stripes and rectangular (BT) leaves.  ref_line is always 0.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("w", "h", "is_luma", "frame_w",
                                             "frame_h", "n_ctu_x", "bd",
                                             "in_frame_only", "leaf_w",
                                             "leaf_h"))
def build_references_rect(buf, x, y, *, w: int, h: int, is_luma: bool,
                          frame_w: int, frame_h: int, n_ctu_x: int,
                          bd: int = 8, in_frame_only: bool = False,
                          leaf_x=None, leaf_y=None, leaf_w: int = 0,
                          leaf_h: int = 0, y_off=0):
    """(top, left) references of length 2w+1 / 2h+1 for a (w, h) block at
    (x, y) — VVC 8.4.5.2.5 refW/refH extents (wide-angle rays on
    non-square blocks read up to 2*n_pred; for squares this equals the
    w+h+1 pre-r5 build).

    leaf_x/leaf_y (+ static leaf_w/leaf_h): optional enclosing-leaf rect in
    which every sample above/left of the block counts as already coded —
    the ISP-stripe availability rule (previous stripes of the same leaf are
    reconstructed although their 8x8-granule Morton index equals the
    leaf's)."""
    half = 1 << (bd - 1)
    nt, nl = 2 * w, 2 * h
    top_raw = jax.lax.dynamic_slice(buf, (y_off + y, x), (1, nt + 1))[0]
    left_raw = jax.lax.dynamic_slice(buf, (y_off + y, x), (nl + 1, 1))[:, 0]

    scan_vals = jnp.concatenate([left_raw[1:][::-1], top_raw])  # nl+nt+1

    j_idx = jnp.arange(nl, 0, -1)
    left_sx = jnp.full((nl,), -1, jnp.int32) + x
    left_sy = y - 1 + j_idx
    top_i = jnp.arange(0, nt + 1)
    top_sx = x - 1 + top_i
    top_sy = jnp.full((nt + 1,), -1, jnp.int32) + y
    sx = jnp.concatenate([left_sx, top_sx])
    sy = jnp.concatenate([left_sy, top_sy])
    scale = 1 if is_luma else 2
    in_frame = (sx >= 0) & (sy >= 0) & (sx < frame_w) & (sy < frame_h)
    if in_frame_only:
        avail = in_frame
    else:
        cur = morton8(x * scale, y * scale, n_ctu_x)
        coded = morton8(jnp.maximum(sx, 0) * scale,
                        jnp.maximum(sy, 0) * scale, n_ctu_x) < cur
        if leaf_x is not None:
            inside = ((sx >= leaf_x) & (sx < leaf_x + leaf_w)
                      & (sy >= leaf_y) & (sy < leaf_y + leaf_h))
            coded = coded | inside
        avail = in_frame & coded

    idx = jnp.arange(nl + nt + 1)
    last_avail = jax.lax.cummax(jnp.where(avail, idx, -1))
    first_avail = jnp.argmax(avail)
    src = jnp.where(last_avail >= 0, last_avail, first_avail)
    filled = scan_vals[src]
    filled = jnp.where(avail.any(), filled, half).astype(jnp.int32)

    left = jnp.concatenate([filled[nl:nl + 1], filled[:nl][::-1]])
    top = filled[nl:]
    return top, left


def build_references_rect_win(win, x0, y0, px, py, *, w: int, h: int,
                              is_luma: bool, frame_w: int, frame_h: int,
                              n_ctu_x: int, bd: int = 8, win_n: int,
                              leaf_w: int = 0, leaf_h: int = 0):
    """build_references_rect twin reading a local (win_n, win_n) window.

    ``win`` is a gathered copy of the recon buffer starting at buffer index
    (y0, x0) — i.e. win[r, c] = buf[y0 + r, x0 + c] — which the caller
    patches with in-leaf reconstruction as it proceeds (the ISP stripe
    loop under vmap, where per-leaf global buffer updates are impossible).
    (px, py) is the block position in plane coords; availability is
    computed from the global geometry exactly as build_references_rect
    (leaf rect = (x0, y0) + (leaf_w, leaf_h), the enclosing leaf)."""
    half = 1 << (bd - 1)
    nt, nl = 2 * w, 2 * h
    ry, rx = py - y0, px - x0
    top_raw = jax.lax.dynamic_slice(win, (ry, rx), (1, nt + 1))[0]
    left_raw = jax.lax.dynamic_slice(win, (ry, rx), (nl + 1, 1))[:, 0]

    scan_vals = jnp.concatenate([left_raw[1:][::-1], top_raw])

    j_idx = jnp.arange(nl, 0, -1)
    left_sx = jnp.full((nl,), -1, jnp.int32) + px
    left_sy = py - 1 + j_idx
    top_i = jnp.arange(0, nt + 1)
    top_sx = px - 1 + top_i
    top_sy = jnp.full((nt + 1,), -1, jnp.int32) + py
    sx = jnp.concatenate([left_sx, top_sx])
    sy = jnp.concatenate([left_sy, top_sy])
    scale = 1 if is_luma else 2
    in_frame = (sx >= 0) & (sy >= 0) & (sx < frame_w) & (sy < frame_h)
    cur = morton8(px * scale, py * scale, n_ctu_x)
    coded = morton8(jnp.maximum(sx, 0) * scale,
                    jnp.maximum(sy, 0) * scale, n_ctu_x) < cur
    inside = ((sx >= x0) & (sx < x0 + leaf_w)
              & (sy >= y0) & (sy < y0 + leaf_h))
    avail = in_frame & (coded | inside)

    idx = jnp.arange(nl + nt + 1)
    last_avail = jax.lax.cummax(jnp.where(avail, idx, -1))
    first_avail = jnp.argmax(avail)
    src = jnp.where(last_avail >= 0, last_avail, first_avail)
    filled = scan_vals[src]
    filled = jnp.where(avail.any(), filled, half).astype(jnp.int32)

    left = jnp.concatenate([filled[nl:nl + 1], filled[:nl][::-1]])
    top = filled[nl:]
    return top, left


_SMOOTH_THRES_BY_LOG2 = {2: 64, 3: 14, 4: 2, 5: 0, 6: 0}


def _ref_filter_flag_rect(mode, w: int, h: int):
    """mode may be wide-angle remapped (67..94): distance uses the
    signed mode (negative for the wide-low range) — twin of spec
    ref_filter_flag."""
    log2s = ((int(w).bit_length() - 1) + (int(h).bit_length() - 1)) >> 1
    thres = _SMOOTH_THRES_BY_LOG2.get(log2s, 0)
    signed = jnp.where(mode > 80, 80 - mode, mode)
    dist = jnp.minimum(jnp.abs(signed - rom.HOR_IDX),
                       jnp.abs(signed - rom.VER_IDX))
    is_special = (mode == rom.DC_IDX) | (mode == rom.HOR_IDX) | \
        (mode == rom.VER_IDX)
    planar_f = (mode == rom.PLANAR_IDX) & (w * h > 32)
    ang_f = ((mode >= 2) | (mode > 80)) & (dist > thres)
    return jnp.where(is_special, False, planar_f | ang_f)


def _planar_rect(top, left, w: int, h: int):
    lw, lh = int(w).bit_length() - 1, int(h).bit_length() - 1
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    t = top[1:w + 1]
    l = left[1:h + 1]
    tr = top[w + 1]
    bl = left[h + 1]
    pv = (h - 1 - ys)[:, None] * t[None, :] + (ys + 1)[:, None] * bl
    ph = (w - 1 - xs)[None, :] * l[:, None] + (xs + 1)[None, :] * tr
    return ((pv << lw) + (ph << lh) + w * h) >> (lw + lh + 1)


def _dc_rect(top, left, w: int, h: int):
    if w == h:
        ssum = top[1:w + 1].sum() + left[1:h + 1].sum()
        v = (ssum + ((w + h) >> 1)) // (w + h)
    elif w > h:
        v = (top[1:w + 1].sum() + (w >> 1)) >> (int(w).bit_length() - 1)
    else:
        v = (left[1:h + 1].sum() + (h >> 1)) >> (int(h).bit_length() - 1)
    return jnp.full((h, w), v, jnp.int32)


def _angular_rect(top, left, mode, w: int, h: int, is_luma: bool, filt):
    angle = jnp.asarray(_ANGLE)[mode]
    inv_angle = jnp.asarray(_INV_ANGLE)[mode]

    def one(main, side, n_pred: int, n_orth: int):
        ext_len = 2 * (n_pred + n_orth) + 2
        off = n_orth
        # main reference is 2*n_pred+1 long (VVC refW/refH extents, r5);
        # the 4-tap tail past 2*n_pred clamps to the last built sample
        ln = 2 * n_pred
        i_main = jnp.clip(jnp.arange(ext_len) - off, 0, ln)
        ext = main[i_main]
        k = off - jnp.arange(off)
        sidx = jnp.clip((k * inv_angle + 256) >> 9, 0, 2 * n_orth)
        proj = side[sidx]
        neg = angle < 0
        ext = ext.at[:off].set(jnp.where(neg, proj, ext[:off]))
        ys = jnp.arange(1, n_orth + 1, dtype=jnp.int32)
        pos = ys * angle
        i_idx = pos >> 5
        i_fact = pos & 31
        xs = jnp.arange(n_pred, dtype=jnp.int32)
        base = off + 1 + xs[None, :] + i_idx[:, None]
        integer_slope = (angle % 32) == 0
        a = ext[jnp.clip(base, 0, ext_len - 1)]
        b = ext[jnp.clip(base + 1, 0, ext_len - 1)]
        two_tap = ((32 - i_fact)[:, None] * a
                   + i_fact[:, None] * b + 16) >> 5
        if not is_luma:
            return jnp.where(integer_slope, a, two_tap)
        taps = jnp.where(filt, jnp.asarray(_TAPS_SMOOTH)[i_fact], jnp.asarray(_TAPS_SHARP)[i_fact])
        four = jnp.zeros((n_orth, n_pred), jnp.int32)
        for t in range(4):
            four = four + taps[:, t][:, None] * ext[
                jnp.clip(base + t - 1, 0, ext_len - 1)]
        four = (four + 32) >> 6
        return jnp.where(integer_slope, a, four)

    if w == h:
        vertical = mode >= rom.DIA_IDX
        main = jnp.where(vertical, top, left)
        side = jnp.where(vertical, left, top)
        pred = one(main, side, w, h)
        return jnp.where(vertical, pred, pred.T)
    # wide-high indices (67..80) predict from the top; wide-low (81..94)
    # from the left
    return jax.lax.cond((mode >= rom.DIA_IDX) & (mode <= 80),
                        lambda: one(top, left, w, h),
                        lambda: one(left, top, h, w).T)


def _pdpc_rect(pred, top, left, mode, w: int, h: int, bd: int):
    scale = ((int(w).bit_length() - 1) + (int(h).bit_length() - 1) - 2) >> 2
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    wl = (32 >> jnp.minimum(31, (xs * 2) >> scale))[None, :]
    wt = (32 >> jnp.minimum(31, (ys * 2) >> scale))[:, None]
    t = top[1:w + 1][None, :]
    l = left[1:h + 1][:, None]
    corner = top[0]
    mx = (1 << bd) - 1
    plain = (wl * l + wt * t + (64 - wl - wt) * pred + 32) >> 6
    ver = jnp.clip(pred + ((wl * (l - corner) + 32) >> 6), 0, mx)
    hor = jnp.clip(pred + ((wt * (t - corner) + 32) >> 6), 0, mx)
    return jnp.where((mode == rom.PLANAR_IDX) | (mode == rom.DC_IDX), plain,
                     jnp.where(mode == rom.VER_IDX, ver,
                               jnp.where(mode == rom.HOR_IDX, hor, pred)))


@functools.partial(jax.jit, static_argnames=("w", "h", "is_luma", "bd"))
def predict_rect(top, left, mode, *, w: int, h: int, is_luma: bool,
                 bd: int = 8):
    """Predict an (h, w) block from length-(w+h+1) references; twin of
    spec/intra.predict for rectangular shapes (ref_line 0 only)."""
    mode = jnp.asarray(mode, jnp.int32)
    m2 = mode
    if w != h:
        # wide-angle remap (twin of rom.wide_angle_mode; w/h static)
        r = abs((int(w).bit_length() - 1) - (int(h).bit_length() - 1))
        if w > h:
            thr = (8 + 2 * r) if r > 1 else 8
            m2 = jnp.where((mode >= 2) & (mode < thr), mode + 65, mode)
        else:
            thr = (60 - 2 * r) if r > 1 else 60
            m2 = jnp.where((mode <= 66) & (mode > thr), 147 - mode, mode)
    if is_luma:
        filt = _ref_filter_flag_rect(m2, w, h)
        angle = jnp.asarray(_ANGLE)[m2]
        smooth_now = filt & ((mode == rom.PLANAR_IDX) | ((angle % 32) == 0))
        ts, ls = _smooth(top, left)
        top_u = jnp.where(smooth_now, ts, top)
        left_u = jnp.where(smooth_now, ls, left)
    else:
        filt = jnp.asarray(False)
        top_u, left_u = top, left

    pred = jax.lax.switch(
        jnp.minimum(mode, 2),
        [lambda: _planar_rect(top_u, left_u, w, h),
         lambda: _dc_rect(top_u, left_u, w, h),
         lambda: _angular_rect(top_u, left_u, jnp.maximum(m2, 2), w, h,
                               is_luma, filt)])
    if is_luma:
        pred = _pdpc_rect(pred, top_u, left_u, mode, w, h, bd)
    return jnp.clip(pred, 0, (1 << bd) - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# MIP — device twin of spec/intra.mip_predict (integer bit-exact).  The
# matrix multiply is the MXU-native core (SURVEY.md §2.9 "MIP matmul").
# ---------------------------------------------------------------------------
_MIP_W = {rs: jnp.asarray(np.asarray(rom.mip_weights(rs)), jnp.int32)
          for rs in (4, 8)}


@functools.partial(jax.jit, static_argnames=("s", "bd"))
def mip_predict_j(top, left, mode16, *, s: int, bd: int = 8):
    """MIP prediction, traced mode16 = 2 * matrix_mode + transpose."""
    from ..spec.intra import _mip_upsample_idx
    rs = rom.MIP_REDUCED[s]
    mode16 = jnp.clip(jnp.asarray(mode16, jnp.int32), 0,
                      2 * rom.NUM_MIP_MODES - 1)
    m, tr = mode16 >> 1, (mode16 & 1) > 0
    w = _MIP_W[rs][m]
    mx = (1 << bd) - 1
    r4 = s // 4
    lr4 = int(r4).bit_length() - 1
    t = top[1:s + 1]
    l = left[1:s + 1]
    b_t = (t.reshape(4, r4).sum(axis=1) + (r4 >> 1)) >> lr4
    b_l = (l.reshape(4, r4).sum(axis=1) + (r4 >> 1)) >> lr4
    b = jnp.where(tr, jnp.concatenate([b_l, b_t]),
                  jnp.concatenate([b_t, b_l])).astype(jnp.int32)
    red = jnp.clip((jnp.matmul(w, b, preferred_element_type=jnp.int32)
                    + (1 << (rom.MIP_SHIFT - 1))) >> rom.MIP_SHIFT,
                   0, mx).reshape(rs, rs)
    red = jnp.where(tr, red.T, red)
    if rs == s:
        return red.astype(jnp.int32)
    k0_np, d_np, u = _mip_upsample_idx(s, rs)
    lu = int(u).bit_length() - 1
    k0 = jnp.asarray(k0_np, jnp.int32)
    d = jnp.asarray(d_np, jnp.int32)
    lrow = b_l[jnp.asarray((np.arange(rs) * 4) // rs, jnp.int32)]
    a = jnp.where(k0[None, :] >= 0, red[:, jnp.maximum(k0, 0)],
                  lrow[:, None])
    bb = red[:, jnp.minimum(k0 + 1, rs - 1)]
    hor = ((u - d)[None, :] * a + d[None, :] * bb + (u >> 1)) >> lu
    a2 = jnp.where(k0[:, None] >= 0, hor[jnp.maximum(k0, 0)], t[None, :])
    b2 = hor[jnp.minimum(k0 + 1, rs - 1)]
    out = ((u - d)[:, None] * a2 + d[:, None] * b2 + (u >> 1)) >> lu
    return jnp.clip(out, 0, mx).astype(jnp.int32)


# ---------------------------------------------------------------------------
# CCLM — device twin of spec/intra.py cclm_predict (integer bit-exact)
# ---------------------------------------------------------------------------
from ..spec.intra import CCLM_AMAX, CCLM_SHIFT  # noqa: E402


def _sort4_j(l, c):
    """5-comparator sorting network on (luma, chroma) 4-vectors — identical
    comparator sequence to spec/intra._sort4."""
    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        sw = l[i] > l[j]
        li = jnp.where(sw, l[j], l[i])
        lj = jnp.where(sw, l[i], l[j])
        ci = jnp.where(sw, c[j], c[i])
        cj = jnp.where(sw, c[i], c[j])
        l = l.at[i].set(li).at[j].set(lj)
        c = c.at[i].set(ci).at[j].set(cj)
    return l, c


def cclm_predict_local(by, bc, rec_y, cx, cy, *, cs: int, frame_w: int,
                       frame_h: int, n_ctu_x: int, bd: int = 8,
                       y_off_l=0, y_off_c=0):
    """cclm_predict_j twin for the batched wavefront engine: the collocated
    luma interior comes from the locally computed (2cs, 2cs) leaf recon
    ``rec_y`` instead of the global buffer (which, under vmap, has not been
    scattered yet); boundary rows/cols still gather from the global
    buffers.  Arithmetic identical — the original's interior window
    [:, 1:] is exactly rec_y."""
    left_col = jax.lax.dynamic_slice(by, (y_off_l + 2 * cy + 1, 2 * cx),
                                     (2 * cs, 1))
    blk_win = jnp.concatenate([left_col, rec_y], axis=1)
    return _cclm_core(by, bc, blk_win, cx, cy, cs=cs, frame_w=frame_w,
                      frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd,
                      y_off_l=y_off_l, y_off_c=y_off_c)


def cclm_predict_j(by, bc, cx, cy, *, cs: int, frame_w: int, frame_h: int,
                   n_ctu_x: int, bd: int = 8):
    """CCLM chroma prediction on device.  by/bc: luma/chroma recon buffers
    with the +1 top-left offset; (cx, cy) chroma coords; returns (cs, cs)."""
    blk_win = jax.lax.dynamic_slice(by, (2 * cy + 1, 2 * cx),
                                    (2 * cs, 2 * cs + 1))
    return _cclm_core(by, bc, blk_win, cx, cy, cs=cs, frame_w=frame_w,
                      frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd)


def cclm_predict_j_off(by, bc, cx, cy, *, cs: int, frame_w: int,
                       frame_h: int, n_ctu_x: int, bd: int = 8,
                       y_off_l=0, y_off_c=0):
    """cclm_predict_j with frame-slab offsets (batched engine)."""
    blk_win = jax.lax.dynamic_slice(by, (y_off_l + 2 * cy + 1, 2 * cx),
                                    (2 * cs, 2 * cs + 1))
    return _cclm_core(by, bc, blk_win, cx, cy, cs=cs, frame_w=frame_w,
                      frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd,
                      y_off_l=y_off_l, y_off_c=y_off_c)


def _cclm_core(by, bc, blk_win, cx, cy, *, cs: int, frame_w: int,
               frame_h: int, n_ctu_x: int, bd: int = 8,
               y_off_l=0, y_off_c=0):
    half = 1 << (bd - 1)
    mx = (1 << bd) - 1

    def ds_from(win, cxv):
        # win: (2r, 2cs+1) luma covering plane cols 2cx-1 .. 2cx+2cs-1
        win = win.at[:, 0].set(jnp.where(cxv > 0, win[:, 0], win[:, 1]))
        a, b = win[0::2], win[1::2]
        return ((2 * a[:, 1:2 * cs:2] + a[:, 0:2 * cs - 1:2]
                 + a[:, 2:2 * cs + 1:2]
                 + 2 * b[:, 1:2 * cs:2] + b[:, 0:2 * cs - 1:2]
                 + b[:, 2:2 * cs + 1:2] + 4) >> 3)

    # interior block (luma rows 2cy.., buffer offset +1)
    ds = ds_from(blk_win, cx)

    # above reference row (luma rows 2cy-2, 2cy-1)
    ab_win = jax.lax.dynamic_slice(by, (y_off_l + 2 * cy - 1, 2 * cx),
                                   (2, 2 * cs + 1))
    a_ds = ds_from(ab_win, cx)[0]                       # (cs,)
    # left reference column (luma cols 2cx-3 .. 2cx-1 -> buf 2cx-2 ..)
    lf_win = jax.lax.dynamic_slice(by, (y_off_l + 2 * cy + 1, 2 * cx - 2),
                                   (2 * cs, 3))
    a2, b2 = lf_win[0::2], lf_win[1::2]
    l_ds = ((2 * a2[:, 1] + a2[:, 0] + a2[:, 2]
             + 2 * b2[:, 1] + b2[:, 0] + b2[:, 2] + 4) >> 3)   # (cs,)

    # neighbour chroma samples
    a_c = jax.lax.dynamic_slice(bc, (y_off_c + cy, cx + 1), (1, cs))[0]
    l_c = jax.lax.dynamic_slice(bc, (y_off_c + cy + 1, cx), (cs, 1))[:, 0]

    cur = morton8(2 * cx, 2 * cy, n_ctu_x)
    above = (cy > 0) & (morton8(2 * cx, jnp.maximum(2 * cy - 2, 0),
                                n_ctu_x) < cur)
    left = (cx > 0) & (morton8(jnp.maximum(2 * cx - 2, 0), 2 * cy,
                               n_ctu_x) < cur)

    i2a, i2b = cs // 4, (3 * cs) // 4
    i4 = tuple(((2 * k + 1) * cs) >> 3 for k in range(4))

    def pick(arr_a, arr_l):
        both = jnp.stack([arr_a[i2a], arr_a[i2b], arr_l[i2a], arr_l[i2b]])
        only_a = jnp.stack([arr_a[i] for i in i4])
        only_l = jnp.stack([arr_l[i] for i in i4])
        return jnp.where(above & left, both,
                         jnp.where(above, only_a, only_l))

    pl = pick(a_ds, l_ds).astype(jnp.int32)
    pc = pick(a_c, l_c).astype(jnp.int32)
    pl, pc = _sort4_j(pl, pc)
    lmin = (pl[0] + pl[1] + 1) >> 1
    cmin = (pc[0] + pc[1] + 1) >> 1
    lmax = (pl[2] + pl[3] + 1) >> 1
    cmax = (pc[2] + pc[3] + 1) >> 1
    d = lmax - lmin
    dsafe = jnp.maximum(d, 1)
    a = jnp.clip(((cmax - cmin) << CCLM_SHIFT) // dsafe,
                 -CCLM_AMAX, CCLM_AMAX)
    a = jnp.where(d == 0, 0, a)
    b = jnp.where(d == 0, (cmin + cmax + 1) >> 1,
                  cmin - ((a * lmin) >> CCLM_SHIFT))
    pred = ((a * ds) >> CCLM_SHIFT) + b
    pred = jnp.where(above | left, pred, half)
    return jnp.clip(pred, 0, mx).astype(jnp.int32)
