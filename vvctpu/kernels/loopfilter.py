"""Device (JAX) in-loop filters — twins of spec/deblock.py and spec/sao.py.

Deblocking maps perfectly onto the VPU: vertical-edge windows on the 8x8
luma grid are DISJOINT 8-column tiles (edge spacing == window width), so the
whole frame filters as one reshaped elementwise pass — no scatter conflicts,
no Pallas needed (XLA fuses the select trees).  Horizontal edges run on the
transposed plane, exactly like the spec model, so results are bit-identical
(tests/test_loopfilter_dev.py).

SAO: band/edge offset application is a pure elementwise neighbour stencil +
LUT; the per-CTU parameter selection stays host-side (encoder-only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.deblock import BETA_TABLE, TC_TABLE


def _clip3(lo, hi, v):
    return jnp.minimum(jnp.maximum(v, lo), hi)


def _luma_segment_filter_j(p, q, beta, tc, bd):
    """Twin of spec _luma_segment_filter on (..., 4)-line segments."""
    dp_line = jnp.abs(p[2] - 2 * p[1] + p[0])
    dq_line = jnp.abs(q[2] - 2 * q[1] + q[0])
    dp = dp_line[..., 0] + dp_line[..., 3]
    dq = dq_line[..., 0] + dq_line[..., 3]
    d = dp + dq
    active = (d < beta)[..., None]

    strong_l = jnp.ones(p[0].shape[:-1], bool)
    for ln in (0, 3):
        sd = 2 * (dp_line[..., ln] + dq_line[..., ln]) < (beta >> 2)
        sg = (jnp.abs(p[3][..., ln] - p[0][..., ln])
              + jnp.abs(q[0][..., ln] - q[3][..., ln])) < (beta >> 3)
        st = jnp.abs(p[0][..., ln] - q[0][..., ln]) < ((5 * tc + 1) >> 1)
        strong_l &= sd & sg & st
    strong = strong_l[..., None]

    def c2(v, ref):
        return _clip3(ref - 2 * tc, ref + 2 * tc, v)

    sp0 = c2((p[2] + 2 * p[1] + 2 * p[0] + 2 * q[0] + q[1] + 4) >> 3, p[0])
    sp1 = c2((p[2] + p[1] + p[0] + q[0] + 2) >> 2, p[1])
    sp2 = c2((2 * p[3] + 3 * p[2] + p[1] + p[0] + q[0] + 4) >> 3, p[2])
    sq0 = c2((q[2] + 2 * q[1] + 2 * q[0] + 2 * p[0] + p[1] + 4) >> 3, q[0])
    sq1 = c2((q[2] + q[1] + q[0] + p[0] + 2) >> 2, q[1])
    sq2 = c2((2 * q[3] + 3 * q[2] + q[1] + q[0] + p[0] + 4) >> 3, q[2])

    delta = (9 * (q[0] - p[0]) - 3 * (q[1] - p[1]) + 8) >> 4
    weak_on = jnp.abs(delta) < (tc * 10)
    dc = _clip3(-tc, tc, delta)
    mx = (1 << bd) - 1
    wp0 = _clip3(0, mx, p[0] + dc)
    wq0 = _clip3(0, mx, q[0] - dc)
    side_p = (dp < ((beta + (beta >> 1)) >> 3))[..., None]
    side_q = (dq < ((beta + (beta >> 1)) >> 3))[..., None]
    tc2 = tc >> 1
    dp1 = _clip3(-tc2, tc2, (((p[2] + p[0] + 1) >> 1) - p[1] + dc) >> 1)
    dq1 = _clip3(-tc2, tc2, (((q[2] + q[0] + 1) >> 1) - q[1] - dc) >> 1)
    wp1 = _clip3(0, mx, p[1] + dp1)
    wq1 = _clip3(0, mx, q[1] + dq1)

    fp0 = jnp.where(active, jnp.where(strong, sp0,
                                      jnp.where(weak_on, wp0, p[0])), p[0])
    fq0 = jnp.where(active, jnp.where(strong, sq0,
                                      jnp.where(weak_on, wq0, q[0])), q[0])
    fp1 = jnp.where(active,
                    jnp.where(strong, sp1,
                              jnp.where(weak_on & side_p, wp1, p[1])), p[1])
    fq1 = jnp.where(active,
                    jnp.where(strong, sq1,
                              jnp.where(weak_on & side_q, wq1, q[1])), q[1])
    fp2 = jnp.where(active & strong, sp2, p[2])
    fq2 = jnp.where(active & strong, sq2, q[2])
    return ([_clip3(0, mx, fp0), _clip3(0, mx, fp1), _clip3(0, mx, fp2)],
            [_clip3(0, mx, fq0), _clip3(0, mx, fq1), _clip3(0, mx, fq2)])


def _filter_luma_ver_j(rec, mask, qp, bd: int):
    """All vertical luma edges in one dense pass.

    rec: (H, W) int32; mask: (H//8, W//8) bool granule left-edge activity.
    Edge windows [8k+4, 8k+12) are disjoint, so the frame reshapes into
    (H//4, 4, nW, 8) tiles filtered elementwise."""
    h, w = rec.shape
    beta = jnp.asarray(BETA_TABLE)[qp] << (bd - 8)
    tc = jnp.asarray(TC_TABLE)[qp] << (bd - 8)
    x32 = rec.astype(jnp.int32)
    core = x32[:, 4:w - 4]                       # first window at edge x=8
    n_w = (w - 8) // 8
    tiles = core.reshape(h // 4, 4, n_w, 8).transpose(0, 2, 1, 3)
    # segment activity: segment row s (4 lines) belongs to granule row s//2;
    # edge column k corresponds to granule column k+1 (edge at x=8(k+1))
    seg_mask = jnp.repeat(mask[:, 1:], 2, axis=0)        # (H//4, nW)
    p = [tiles[..., 3 - i] for i in range(4)]            # p0 at col 3
    q = [tiles[..., 4 + i] for i in range(4)]
    fp, fq = _luma_segment_filter_j(p, q, beta, tc, bd)
    m = seg_mask[..., None]
    out_tiles = tiles
    for i in range(3):
        out_tiles = out_tiles.at[..., 3 - i].set(
            jnp.where(m, fp[i], tiles[..., 3 - i]))
        out_tiles = out_tiles.at[..., 4 + i].set(
            jnp.where(m, fq[i], tiles[..., 4 + i]))
    core_out = out_tiles.transpose(0, 2, 1, 3).reshape(h, w - 8)
    return jnp.concatenate([x32[:, :4], core_out, x32[:, w - 4:]], axis=1)


def _filter_chroma_ver_j(rec, mask, qp, bd: int):
    """Chroma vertical edges (2-point filter), dense tiles of width 4.

    Spec skips edges with x < 2 or x + 1 >= w — i.e. x = 0 only; windows
    [4k+2, 4k+6) are disjoint."""
    h, w = rec.shape
    tc = jnp.asarray(TC_TABLE)[qp] << (bd - 8)
    x32 = rec.astype(jnp.int32)
    core = x32[:, 2:w - 2]
    n_w = (w - 4) // 4
    tiles = core.reshape(h // 4, 4, n_w, 4).transpose(0, 2, 1, 3)
    seg_mask = mask[:, 1:]                        # (H//4? no: gh, nW)
    # chroma rows: 4-px rows per granule row (chroma h == 4 * gh)
    # mask rows are luma granule rows == chroma 4-row groups directly
    p1 = tiles[..., 0]
    p0 = tiles[..., 1]
    q0 = tiles[..., 2]
    q1 = tiles[..., 3]
    mx = (1 << bd) - 1
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + p1 - q1 + 4) >> 3)
    m = seg_mask[..., None]
    fp0 = jnp.where(m, _clip3(0, mx, p0 + delta), p0)
    fq0 = jnp.where(m, _clip3(0, mx, q0 - delta), q0)
    out_tiles = tiles.at[..., 1].set(fp0).at[..., 2].set(fq0)
    core_out = out_tiles.transpose(0, 2, 1, 3).reshape(h, w - 4)
    return jnp.concatenate([x32[:, :2], core_out, x32[:, w - 2:]], axis=1)


@functools.partial(jax.jit, static_argnames=("bd",))
def _deblock_jit(y, cb, cr, ver, hor, qp, bd: int):
    oy = _filter_luma_ver_j(y, ver, qp, bd)
    oy = _filter_luma_ver_j(oy.T, hor.T, qp, bd).T
    ocb = _filter_chroma_ver_j(cb, ver, qp, bd)
    ocb = _filter_chroma_ver_j(ocb.T, hor.T, qp, bd).T
    ocr = _filter_chroma_ver_j(cr, ver, qp, bd)
    ocr = _filter_chroma_ver_j(ocr.T, hor.T, qp, bd).T
    return oy, ocb, ocr


def deblock_frame_j(planes, decisions, qp: int, bd: int = 8,
                    fetch: bool = True):
    """Device twin of spec deblock.deblock_frame (bit-identical).
    fetch=False keeps the results on device (device-resident pipeline)."""
    from ..spec.deblock import edge_masks
    y, cb, cr = planes
    h, w = y.shape
    ver, hor = edge_masks(decisions, h, w)
    oy, ocb, ocr = _deblock_jit(jnp.asarray(y), jnp.asarray(cb),
                                jnp.asarray(cr), jnp.asarray(ver),
                                jnp.asarray(hor), jnp.int32(qp), bd)
    if not fetch:
        return [oy, ocb, ocr]
    from ..core import xfer
    return xfer.device_get([oy, ocb, ocr])   # one tunnel round trip


# ---------------------------------------------------------------------------
# SAO offset application — device twin of spec/sao.py _apply_component
# ---------------------------------------------------------------------------
from ..spec.sao import (MAX_OFFSET, N_BANDS, SAO_BAND,  # noqa: E402
                        SAO_EO0, SAO_EO45, SAO_EO90, SAO_EO135,
                        _EO_NEIGH, _EO_SIGN)


def _edge_categories_j(p, t: int):
    (dy1, dx1), (dy2, dx2) = _EO_NEIGH[t]
    h, w = p.shape
    z = jnp.pad(p, 1, mode="edge")
    n1 = jax.lax.dynamic_slice(z, (1 + dy1, 1 + dx1), (h, w))
    n2 = jax.lax.dynamic_slice(z, (1 + dy2, 1 + dx2), (h, w))
    cat = 2 + jnp.sign(p - n1) + jnp.sign(p - n2)
    if dy1 != 0 or dy2 != 0:
        cat = cat.at[0, :].set(2).at[-1, :].set(2)
    if dx1 != 0 or dx2 != 0:
        cat = cat.at[:, 0].set(2).at[:, -1].set(2)
    return cat


def _sao_component_j(rec, tp, offs_px, bp, bd: int):
    """rec (h, w) int32; tp / bp (h, w) int32 per-pixel type / band pos;
    offs_px (h, w, 4) int32."""
    mx = (1 << bd) - 1
    add = jnp.zeros_like(rec)
    for t in range(SAO_EO0, SAO_EO45 + 1):
        cat = _edge_categories_j(rec, t)
        m_t = tp == t
        for oi, ci in enumerate((0, 1, 3, 4)):
            m = m_t & (cat == ci)
            add = add + jnp.where(m, offs_px[..., oi] * int(_EO_SIGN[ci]),
                                  0)
    rel = jnp.mod((rec >> (bd - 5)) - bp, N_BANDS)
    sel = jnp.take_along_axis(offs_px, jnp.minimum(rel, 3)[..., None],
                              axis=-1)[..., 0]
    add = add + jnp.where((tp == SAO_BAND) & (rel < 4), sel, 0)
    return jnp.clip(rec + add, 0, mx)


@functools.partial(jax.jit, static_argnames=("ctu", "bd"))
def _sao_jit(recs, tps, offs, bps, ctu: int, bd: int):
    out = []
    for c in range(3):
        rec = recs[c]
        h, w = rec.shape
        cs = ctu // (1 if c == 0 else 2)

        def up(a):
            # per-CTU params are up-sampled ON DEVICE: the host->device
            # tunnel is the decode bottleneck (~30-100 MB/s) and per-pixel
            # int32 param planes were ~75 MB/frame at 1080p (round-4
            # profile); the compact (nY, nX) arrays are a few KB.
            # jnp.repeat == np.kron-with-ones on ints (bit-identical).
            return jnp.repeat(jnp.repeat(a, cs, axis=0), cs,
                              axis=1)[:h, :w]

        out.append(_sao_component_j(rec, up(tps[c]), up(offs[c]),
                                    up(bps[c]), bd))
    return tuple(out)


def apply_sao_j(planes, params, ctu: int = 64, bd: int = 8,
                fetch: bool = True):
    """Device twin of spec sao.apply_sao (bit-identical)."""
    recs, tps, offs, bps = [], [], [], []
    for comp in range(3):
        recs.append(jnp.asarray(planes[comp]).astype(jnp.int32))
        tps.append(jnp.asarray(params.type[:, :, comp].astype(np.int32)))
        offs.append(jnp.asarray(
            params.offsets[:, :, comp].astype(np.int32)))
        bps.append(jnp.asarray(
            params.band_pos[:, :, comp].astype(np.int32)))
    out = _sao_jit(tuple(recs), tuple(tps), tuple(offs), tuple(bps), ctu,
                   bd)
    if not fetch:
        return list(out)
    from ..core import xfer
    return xfer.device_get(list(out))       # one tunnel round trip


# ---------------------------------------------------------------------------
# Device SAO decide — bit-exact twin of spec/sao.py decide_sao (integer
# rounding, int32-safe cost scale).  Stats are per-(CTU, category)
# scatter-adds; the RD compare mirrors the spec's argmin order exactly.
# ---------------------------------------------------------------------------
from ..spec.sao import SAO_BAND as _SB, SAO_OFF as _SO  # noqa: E402


def _sao_decide_comp_j(org, rec, lam, n_y: int, n_x: int, cs: int,
                       bd: int):
    """(type (nY*nX,), offs (nY*nX, 4), band_pos (nY*nX,)) int32."""
    h, w = rec.shape
    n_ctu = n_y * n_x
    diff = org - rec
    ctu_id = ((np.arange(h) // cs)[:, None] * n_x
              + (np.arange(w) // cs)[None, :]).astype(np.int32)
    ctu_id = jnp.asarray(ctu_id)

    def lam_bits(b):
        return (b * lam + 128) >> 8

    costs = [None] * 6
    offs = [None] * 6
    costs[_SO] = jnp.broadcast_to(lam_bits(jnp.int32(2)), (n_ctu,))
    offs[_SO] = jnp.zeros((n_ctu, 4), jnp.int32)

    def refine(n, e):
        o = jnp.where(n > 0, (2 * e + n) // jnp.maximum(2 * n, 1), 0)
        o = jnp.clip(o, 0, MAX_OFFSET)
        for _ in range(MAX_OFFSET):
            cur = n * o * o - 2 * o * e
            dn = n * (o - 1) * (o - 1) - 2 * (o - 1) * e
            o = jnp.where((o > 0) & (cur > dn), o - 1, o)
        return o

    sign4 = jnp.asarray(np.asarray(_EO_SIGN, np.int32)[[0, 1, 3, 4]])
    for t in range(SAO_EO0, SAO_EO45 + 1):
        cat = _edge_categories_j(rec, t)
        idx = (ctu_id * 5 + cat).ravel()
        n_cnt = jnp.zeros((n_ctu * 5,), jnp.int32).at[idx].add(
            1).reshape(n_ctu, 5)
        e_sum = jnp.zeros((n_ctu * 5,), jnp.int32).at[idx].add(
            diff.ravel()).reshape(n_ctu, 5)
        n4 = n_cnt[:, (0, 1, 3, 4)]
        e4 = e_sum[:, (0, 1, 3, 4)] * sign4[None, :]
        o4 = refine(n4, e4)
        dd = (n4 * o4 * o4 - 2 * o4 * e4).sum(axis=1)
        costs[t] = dd + lam_bits(jnp.int32(20))
        offs[t] = o4

    band = rec >> (bd - 5)
    idx = (ctu_id * N_BANDS + band).ravel()
    n_b = jnp.zeros((n_ctu * N_BANDS,), jnp.int32).at[idx].add(
        1).reshape(n_ctu, N_BANDS)
    e_b = jnp.zeros((n_ctu * N_BANDS,), jnp.int32).at[idx].add(
        diff.ravel()).reshape(n_ctu, N_BANDS)
    o_b = jnp.sign(e_b) * ((2 * jnp.abs(e_b) + n_b)
                           // jnp.maximum(2 * n_b, 1))
    o_b = jnp.clip(jnp.where(n_b > 0, o_b, 0), -MAX_OFFSET, MAX_OFFSET)
    dd_b = n_b * o_b * o_b - 2 * o_b * e_b
    ddc = jnp.concatenate([dd_b, dd_b[:, :3]], axis=1)
    win = jnp.stack([ddc[:, s:s + 4].sum(axis=1)
                     for s in range(N_BANDS)], axis=1)
    s_best = jnp.argmin(win, axis=1).astype(jnp.int32)
    costs[_SB] = (jnp.take_along_axis(win, s_best[:, None],
                                      axis=1)[:, 0]
                  + lam_bits(jnp.int32(28)))
    rel = (jnp.arange(4)[None, :] + s_best[:, None]) % N_BANDS
    offs[_SB] = jnp.take_along_axis(o_b, rel, axis=1)

    order = [_SO, SAO_EO0, SAO_EO90, SAO_EO135, SAO_EO45, _SB]
    stacked = jnp.stack([costs[t] for t in order])
    pick = jnp.argmin(stacked, axis=0)
    chosen_t = jnp.asarray(np.asarray(order, np.int32))[pick]
    offs_sel = jnp.stack([offs[t] for t in order])[pick,
                                                   jnp.arange(n_ctu)]
    bp = jnp.where(chosen_t == _SB, s_best, 0)
    return chosen_t, offs_sel, bp


def _sao_apply_comp_j(rec, tp_c, offs_c, bp_c, cs: int, bd: int):
    """Apply per-CTU params (CTU-grid arrays) to one component plane."""
    h, w = rec.shape
    n_y, n_x = h // cs, w // cs

    def up(a):
        return jnp.repeat(jnp.repeat(a.reshape(n_y, n_x), cs, axis=0),
                          cs, axis=1)

    tp = up(tp_c)
    bp = up(bp_c)
    offs_px = jnp.stack([up(offs_c[:, i]) for i in range(4)], axis=-1)
    return _sao_component_j(rec, tp, offs_px, bp, bd)


@functools.partial(jax.jit, static_argnames=("ctu", "bd", "lmcs",
                                             "dbk_on", "sao_on"))
def _finish_jit(ry, rcb, rcr, oy, ocb, ocr, inv_lut, ver, hor, qp, lam, *,
                ctu: int, bd: int, lmcs: bool, dbk_on: bool, sao_on: bool):
    """Post-reconstruction device chain: LMCS inverse mapping -> deblock
    -> SAO decide + apply — bit-exact twin of the host sequence
    (inv_lut[] + spec deblock + spec decide_sao + apply).  Returns
    (rec_y, rec_cb, rec_cr, sao_type, sao_offs, sao_bp) with SAO params
    on the (nY, nX, 3[, 4]) CTU grid."""
    y = jnp.take(inv_lut, ry) if lmcs else ry
    cb, cr = rcb, rcr
    if dbk_on:
        y = _filter_luma_ver_j(y, ver, qp, bd)
        y = _filter_luma_ver_j(y.T, hor.T, qp, bd).T
        cb = _filter_chroma_ver_j(cb, ver, qp, bd)
        cb = _filter_chroma_ver_j(cb.T, hor.T, qp, bd).T
        cr = _filter_chroma_ver_j(cr, ver, qp, bd)
        cr = _filter_chroma_ver_j(cr.T, hor.T, qp, bd).T
    h, w = y.shape
    n_y, n_x = h // ctu, w // ctu
    if not sao_on:
        z3 = jnp.zeros((n_y, n_x, 3), jnp.int32)
        return (y, cb, cr, z3, jnp.zeros((n_y, n_x, 3, 4), jnp.int32),
                jnp.zeros((n_y, n_x, 3), jnp.int32))
    types, offs, bps = [], [], []
    outs = []
    for comp, (o, r) in enumerate(((oy, y), (ocb, cb), (ocr, cr))):
        cs = ctu if comp == 0 else ctu // 2
        tc, oc, bc = _sao_decide_comp_j(o.astype(jnp.int32),
                                        r.astype(jnp.int32),
                                        lam, n_y, n_x, cs, bd)
        types.append(tc)
        offs.append(oc)
        bps.append(bc)
        outs.append(_sao_apply_comp_j(r.astype(jnp.int32), tc, oc, bc,
                                      cs, bd))
    sao_type = jnp.stack(types, axis=-1).reshape(n_y, n_x, 3)
    sao_offs = jnp.stack(offs, axis=-2).reshape(n_y, n_x, 3, 4)
    sao_bp = jnp.stack(bps, axis=-1).reshape(n_y, n_x, 3)
    return outs[0], outs[1], outs[2], sao_type, sao_offs, sao_bp


def finish_frame_j(planes, decisions, qp: int, lam: int, orig_planes,
                   inv_lut=None, ctu: int = 64, bd: int = 8,
                   deblock_on: bool = True, sao_on: bool = True):
    """Dispatch the post-recon device chain; returns DEVICE arrays
    (rec_y, rec_cb, rec_cr, sao_type, sao_offs, sao_bp) — callers fetch
    everything in one jax.device_get round trip."""
    from ..spec.deblock import edge_masks
    y = planes[0]
    h, w = (np.asarray(y).shape if not hasattr(y, "shape") else y.shape)
    ver, hor = edge_masks(decisions, h, w)
    il = (jnp.zeros((1,), jnp.int32) if inv_lut is None
          else jnp.asarray(inv_lut))
    return _finish_jit(
        jnp.asarray(planes[0]), jnp.asarray(planes[1]),
        jnp.asarray(planes[2]), jnp.asarray(orig_planes[0]),
        jnp.asarray(orig_planes[1]), jnp.asarray(orig_planes[2]),
        il, jnp.asarray(ver), jnp.asarray(hor), jnp.int32(qp),
        jnp.int32(lam), ctu=ctu, bd=bd, lmcs=inv_lut is not None,
        dbk_on=deblock_on, sao_on=sao_on)


# ---------------------------------------------------------------------------
# ALF + CC-ALF — device twin of spec/alf.py (classification, luma 7x7
# diamond, chroma 5x5, cross-component), bit-identical.
# ---------------------------------------------------------------------------
from ..spec.alf import (_ACT_TABLE, CC_OFFSETS, DIAMOND,  # noqa: E402
                        DIAMOND_C, TRANS_PERMS)


def _prod_gt(a, b, c, d):
    """Exact int32 test a*b > c*d for 0 <= values < 2^17 (the products
    need 34 bits): split b/d into (hi<<8)+lo, then S = X*256 + Y with
    X = a*bh - c*dh, Y = a*bl - c*dl; S > 0  <=>  X > (-Y) >> 8
    (arithmetic shift = floor)."""
    x = a * (b >> 8) - c * (d >> 8)
    y = a * (b & 255) - c * (d & 255)
    return x > ((-y) >> 8)


def classify_j(plane, bd: int):
    """Twin of spec alf.classify: (cls, tr) per 4x4 block, int32-exact."""
    p = plane.astype(jnp.int32)
    z = jnp.pad(p, 1, mode="edge")
    h, w = p.shape
    gv = jnp.abs(2 * p - z[:-2, 1:-1] - z[2:, 1:-1])
    gh = jnp.abs(2 * p - z[1:-1, :-2] - z[1:-1, 2:])
    gd0 = jnp.abs(2 * p - z[:-2, :-2] - z[2:, 2:])
    gd1 = jnp.abs(2 * p - z[:-2, 2:] - z[2:, :-2])

    def bsum(g):
        return g.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3))

    sv, sh_, sd0, sd1 = bsum(gv), bsum(gh), bsum(gd0), bsum(gd1)
    hv1 = jnp.maximum(sv, sh_)
    hv0 = jnp.minimum(sv, sh_)
    d1 = jnp.maximum(sd0, sd1)
    d0 = jnp.minimum(sd0, sd1)
    strong_hv = hv1 > 2 * hv0
    strong_d = d1 > 2 * d0
    diag_main = _prod_gt(d1, hv0, hv1, d0)
    dir_idx = jnp.where(~strong_hv & ~strong_d, 0,
                        jnp.where(diag_main,
                                  jnp.where(strong_d, 4, 3),
                                  jnp.where(strong_hv, 2, 1)))
    act = sv + sh_
    a16 = jnp.clip((act * 16) >> (3 + bd), 0, 15)
    act_idx = jnp.asarray(np.asarray(_ACT_TABLE, np.int32))[a16]
    cls = dir_idx * 5 + act_idx
    tr = (sv > sh_).astype(jnp.int32) + 2 * (sd1 > sd0).astype(jnp.int32)
    return cls, tr


def _stencil(z, pad: int, offsets, p):
    h, w = p.shape
    outs = []
    for (dy, dx) in offsets:
        a = jax.lax.dynamic_slice(z, (pad + dy, pad + dx), (h, w))
        b = jax.lax.dynamic_slice(z, (pad - dy, pad - dx), (h, w))
        outs.append(a + b - 2 * p)
    return outs


@functools.partial(jax.jit, static_argnames=("ctu", "bd"))
def _alf_luma_jit(plane, coeff_eff, present, ctu_on, ctu: int, bd: int):
    h, w = plane.shape
    p = plane.astype(jnp.int32)
    cls, tr = classify_j(p, bd)
    per_block = coeff_eff[cls, tr] * present[cls][..., None]  # (h/4,w/4,12)
    per_pix = jnp.repeat(jnp.repeat(per_block, 4, axis=0), 4, axis=1)
    z = jnp.pad(p, 3, mode="edge")
    feats = _stencil(z, 3, DIAMOND, p)
    delta = jnp.zeros((h, w), jnp.int32)
    for i, f in enumerate(feats):
        delta = delta + per_pix[..., i] * f
    delta = (delta + 64) >> 7
    filt = jnp.clip(p + delta, 0, (1 << bd) - 1)
    on = jnp.repeat(jnp.repeat(ctu_on, ctu, axis=0), ctu, axis=1)[:h, :w]
    return jnp.where(on, filt, p)


@functools.partial(jax.jit, static_argnames=("cctu", "bd", "use_c",
                                             "use_cc"))
def _alf_chroma_jit(base, luma_in, c_coeff, cc_coeff, ctu_on_c,
                    cctu: int, bd: int, use_c: bool, use_cc: bool):
    ch, cw = base.shape
    p = base.astype(jnp.int32)
    delta = jnp.zeros((ch, cw), jnp.int32)
    if use_c:
        z = jnp.pad(p, 2, mode="edge")
        feats = _stencil(z, 2, DIAMOND_C, p)
        for i, f in enumerate(feats):
            delta = delta + c_coeff[i] * f
        delta = (delta + 64) >> 7
    if use_cc:
        lz = jnp.pad(luma_in.astype(jnp.int32), 2, mode="edge")
        ctr = lz[2:2 + 2 * ch:2, 2:2 + 2 * cw:2]
        acc = jnp.zeros((ch, cw), jnp.int32)
        for i, (dy, dx) in enumerate(CC_OFFSETS):
            acc = acc + cc_coeff[i] * (
                lz[2 + dy:2 + dy + 2 * ch:2,
                   2 + dx:2 + dx + 2 * cw:2] - ctr)
        delta = delta + ((acc + 64) >> 7)
    filt = jnp.clip(p + delta, 0, (1 << bd) - 1)
    on = jnp.repeat(jnp.repeat(ctu_on_c, cctu, axis=0),
                    cctu, axis=1)[:ch, :cw]
    return jnp.where(on, filt, p)


def apply_alf_frame_j(planes, params, ctu: int = 64, bd: int = 8):
    """Device twin of spec alf.apply_alf_frame (bit-identical)."""
    luma_in = np.asarray(planes[0])
    if params.enabled:
        eff = (params.coeff[:, TRANS_PERMS]).astype(np.int32)  # (25,4,12)
        oy = _alf_luma_jit(
            jnp.asarray(luma_in.astype(np.int32)), jnp.asarray(eff),
            jnp.asarray(params.present.astype(np.int32)),
            jnp.asarray(params.ctu_on.astype(bool)), ctu, bd)
    else:
        oy = luma_in
    out = [oy]
    for c in (0, 1):
        base = np.asarray(planes[c + 1])
        if not params.c_enabled[c]:
            out.append(base)
            continue
        use_c = bool(params.c_coeff[c].any())
        use_cc = bool(params.cc_present[c])
        o = _alf_chroma_jit(
            jnp.asarray(base.astype(np.int32)),
            jnp.asarray(luma_in.astype(np.int32)),
            jnp.asarray(params.c_coeff[c].astype(np.int32)),
            jnp.asarray(params.cc_coeff[c].astype(np.int32)),
            jnp.asarray(params.ctu_on_c[c].astype(bool)),
            ctu // 2, bd, use_c, use_cc)
        out.append(o)
    from ..core import xfer
    return xfer.device_get(out)             # one tunnel round trip
