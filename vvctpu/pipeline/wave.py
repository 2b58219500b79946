"""Wavefront reconstruction — dependency-levelled batched leaf execution.

TPU-first redesign of the serial coding-order scan (pipeline/recon.py
frame_scan).  The host computes, per phase-B leaf, the earliest wave in
which every reference producer that is *geometrically available* to it
(Morton order — kernels/intra_pred.py availability) has completed: the
QTMTT-aware generalisation of the classic CTU diagonal wavefront
(SURVEY.md §7.3.4, role of VTM's WPP/CTU dependency lag).  The device then
executes one vmapped batch per (wave, leaf-class) and scatters the block
results — O(waves) batched dispatches instead of O(leaves) sequential scan
steps, each batch filling the VPU/MXU with K parallel leaves.

Bit-exact twin of frame_scan: identical per-leaf integer arithmetic (the
leaf bodies mirror recon.py's switch branches, with in-leaf sequential
reads rewritten against local blocks), identical stream/recon output —
enforced by tests/test_wave.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom
from ..kernels import intra_pred, mc, transform
from ..spec.codec import isp_kernels, isp_parts
from ..spec.inter import BCW_W
from . import plan as planmod
from . import recon
from .recon import _CRS_SHIFT, MARGIN, _log2i

# ---------------------------------------------------------------------------
# host: wave schedule
# ---------------------------------------------------------------------------

_MAX_BATCH = 128


def _op_class(op: int, ip: int):
    """(kind, w, h, d) for a phase-B slot op, or None for skip / phase-A."""
    if op in (1, 2, 3):
        s = 8 << (op - 1)
        if ip > 0:
            return ("isp", s, s, ip)
        return ("intra", s, s, 0)
    if op in (7, 8, 9):
        return ("ciip", 8 << (op - 7), 8 << (op - 7), 0)
    if planmod.OP_RECT_INTRA0 <= op < planmod.OP_RECT_INTRA0 + 6:
        w, h = planmod.RECT_SHAPES[op - planmod.OP_RECT_INTRA0]
        return ("rect", w, h, 0)
    if planmod.OP_IBC0 <= op < planmod.OP_IBC0 + 3:
        s = 8 << (op - planmod.OP_IBC0)
        return ("ibc", s, s, 0)
    if planmod.OP_PLT0 <= op < planmod.OP_PLT0 + 3:
        s = 8 << (op - planmod.OP_PLT0)
        return ("plt", s, s, 0)
    return None


def _levels_py(slots: np.ndarray, frame_h: int, frame_w: int) -> np.ndarray:
    """Python reference leveller (fallback when native/wave.c is absent)."""
    gH, gW = frame_h // 8, frame_w // 8
    lvl_map = np.zeros((gH, gW), np.int32)
    lv_out = np.zeros(slots.shape[0], np.int32)
    for i in range(slots.shape[0]):
        cls = _op_class(int(slots[i, 0]), int(slots[i, 15]))
        if cls is None:
            continue
        kind, w, h, _ = cls
        x, y = int(slots[i, 1]), int(slots[i, 2])
        n = w + h
        lv = 0
        gy = y // 8 - 1
        if gy >= 0:
            gx0 = max((x - 8) // 8, 0)
            gx1 = min((x + n) // 8, gW - 1)
            lv = int(lvl_map[gy, gx0:gx1 + 1].max())
        gx = x // 8 - 1
        if gx >= 0:
            gy0 = max((y - 8) // 8, 0)
            gy1 = min((y + n) // 8, gH - 1)
            lv = max(lv, int(lvl_map[gy0:gy1 + 1, gx].max()))
        if kind == "ibc":
            sx = min(max(x + int(slots[i, 4]), 0), frame_w - w)
            sy = min(max(y + int(slots[i, 5]), 0), frame_h - h)
            lv = max(lv, int(lvl_map[sy // 8:(sy + h - 1) // 8 + 1,
                                     sx // 8:(sx + w - 1) // 8 + 1].max()))
        lv += 1
        lvl_map[y // 8:(y + h - 1) // 8 + 1, x // 8:(x + w - 1) // 8 + 1] = lv
        lv_out[i] = lv
    return lv_out


# per-op class geometry tables (0 width = not phase-B); isp resolved from
# the slot's ip column at lookup time
_NOPS = 28
_KIND_RANK = {"ciip": 0, "ibc": 1, "intra": 2, "isp": 3, "plt": 4,
              "rect": 5}


def _op_tables():
    W = np.zeros(_NOPS, np.int32)
    H = np.zeros(_NOPS, np.int32)
    IBC = np.zeros(_NOPS, np.int32)
    KIND = np.zeros(_NOPS, np.int32)      # _KIND_RANK id (isp via ip)
    for op in range(_NOPS):
        cls = _op_class(op, 0)
        if cls is None:
            continue
        kind, w, h, _ = cls
        W[op], H[op] = w, h
        IBC[op] = int(kind == "ibc")
        KIND[op] = _KIND_RANK[kind]
    return W, H, IBC, KIND


_OPT = _op_tables()


def _levels_c(slots: np.ndarray, frame_h: int, frame_w: int):
    """Native leveller via native/wave.c (None if the .so lacks it)."""
    import ctypes

    from ..cabac import native as cnative
    lib = cnative._load()
    fn = getattr(lib, "vvc_wave_levels", None) if lib is not None else None
    if fn is None:
        return None
    W, H, IBC, _ = _OPT
    ops = slots[:, 0]
    geom = np.empty((slots.shape[0], 3), np.int32)
    geom[:, 0] = W[ops]
    geom[:, 1] = H[ops]
    geom[:, 2] = IBC[ops]
    gH, gW = frame_h // 8, frame_w // 8
    lvl_map = np.zeros(gH * gW, np.int32)
    lv_out = np.empty(slots.shape[0], np.int32)
    sl = np.ascontiguousarray(slots, np.int32)
    fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                   ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
                   ctypes.c_void_p]
    fn(sl.ctypes.data, sl.shape[0], sl.shape[1], geom.ctypes.data,
       gH, gW, frame_w, frame_h, lvl_map.ctypes.data, lv_out.ctypes.data)
    return lv_out


def build_schedule(slots: np.ndarray, frame_h: int, frame_w: int):
    """Order phase-B leaves into dependency waves.

    Returns [(cls, rows)] in execution order: cls = (kind, w, h, d), rows an
    (k, 16) int32 array of the slot rows in that batch.  Leaves in one batch
    are mutually independent; every leaf's available reference region
    (top/left strips incl. above-right and below-left reach, plus the IBC
    source rect) is produced by strictly earlier batches.

    Levelling runs in C (native/wave.c) with a Python fallback; grouping is
    vectorised (stable sort by (level, class) keeps the coding-order row
    order inside each batch, identical to the per-leaf reference loop)."""
    lv = _levels_c(slots, frame_h, frame_w)
    if lv is None:
        lv = _levels_py(slots, frame_h, frame_w)
    sel = np.nonzero(lv > 0)[0]
    if sel.size == 0:
        return []
    W, H, _, KIND = _OPT
    ops = slots[sel, 0]
    ips = np.where((ops >= 1) & (ops <= 3), slots[sel, 15], 0)
    kind = np.where(ips > 0, _KIND_RANK["isp"], KIND[ops])
    d = np.where(ips > 0, ips, 0)
    # combined sort key: (level, kind-rank, w, h, d); stable keeps coding
    # order inside each group — matches sorted(batches, key=(lv, cls))
    key = (lv[sel].astype(np.int64) << 32) | (kind.astype(np.int64) << 24) \
        | (W[ops].astype(np.int64) << 16) | (H[ops].astype(np.int64) << 8) \
        | d.astype(np.int64)
    order = np.argsort(key, kind="stable")
    sel_o = sel[order]
    key_o = key[order]
    bounds = np.nonzero(np.diff(key_o))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [key_o.size]])
    inv_kind = {v: k for k, v in _KIND_RANK.items()}
    out = []
    for s0, e0 in zip(starts, ends):
        k = int(key_o[s0])
        cls = (inv_kind[(k >> 24) & 0xFF], (k >> 16) & 0xFF,
               (k >> 8) & 0xFF, k & 0xFF)
        rows = slots[sel_o[s0:e0]]
        for c0 in range(0, rows.shape[0], _MAX_BATCH):
            out.append((cls, rows[c0:c0 + _MAX_BATCH]))
    return out


def _pad_rows(rows: np.ndarray) -> np.ndarray:
    """Pad a (k, 16) batch to the next power-of-two row count with dummy
    rows (x = y = 2^20: gathers clamp, scatters drop)."""
    k = rows.shape[0]
    cap = 1
    while cap < k:
        cap *= 2
    if cap == k:
        return rows
    pad = np.zeros((cap - k, rows.shape[1]), np.int32)
    pad[:, 1] = pad[:, 2] = 1 << 20
    return np.concatenate([rows, pad], axis=0)


# ---------------------------------------------------------------------------
# device: shared pieces
# ---------------------------------------------------------------------------


def _slabs(frame_h: int):
    """Per-frame row strides of the stacked (frame-batched) buffers:
    (luma buf, chroma buf, luma plane, chroma plane, 8-grid plane)."""
    return (frame_h + 1 + MARGIN, frame_h // 2 + 1 + MARGIN,
            frame_h, frame_h // 2, frame_h // 8)


def _row_offs(row, nf: int, frame_h: int):
    """(oL, oC, oP, oPc, o8) memory offsets for a slot row's frame (col 16;
    all zero in single-frame mode so 16-col slots stay valid)."""
    if nf == 1:
        return 0, 0, 0, 0, 0
    sly, slc, spy, spc, sp8 = _slabs(frame_h)
    f = row[16]
    return f * sly, f * slc, f * spy, f * spc, f * sp8


def _scatter(buf, blocks, xs, ys, w: int, h: int, off: int):
    yy = ys[:, None, None] + off + jnp.arange(h)[None, :, None]
    xx = xs[:, None, None] + off + jnp.arange(w)[None, None, :]
    return buf.at[yy, xx].set(blocks, mode="drop")


def _scatter8(plane, vals, xs, ys, o8=0):
    return plane.at[o8 + ys // 8, xs // 8].set(vals, mode="drop")


def _comp_local(src, pred, x, y, w: int, h: int, qp, bd, encode, rdoq,
                lam_rd, dq, crs_sc=None, kh=rom.DCT2, kv=rom.DCT2):
    """recon._component twin on local blocks: returns (rec, lev)."""
    if encode:
        blk = jax.lax.dynamic_slice(src, (y, x), (h, w)).astype(jnp.int32)
        resi = blk - pred
        if crs_sc is not None:
            resi = (resi << 11) // crs_sc
        coef = transform.forward_transform(resi, h, w, kh, kv, bd=bd)
        lev = transform.quantize(coef, h, w, qp, intra=True, bd=bd,
                                 rdoq=rdoq, lam_rd=lam_rd, dq=dq)
    else:
        lev = jax.lax.dynamic_slice(src, (y, x), (h, w))
    if crs_sc is not None:
        r = transform.inverse_transform(
            transform.dequantize(lev, h, w, qp, bd, dq=dq), h, w, kh, kv,
            bd=bd)
        rec = jnp.clip(pred + ((r * crs_sc) >> 11), 0, (1 << bd) - 1)
    else:
        rec = transform.reconstruct(pred, lev, h, w, qp, kh, kv, bd, dq=dq)
    return rec, lev


def _chroma_leaf(by, bcb, bcr, scb, scr, rec_y, x, y, mode_dm, cmode_in,
                 jccr_in, *, s, frame_w, frame_h, n_ctu_x, qp, bd, encode,
                 cclm, rdoq, lam_rd, jccr, dq, sc, offs=(0, 0, 0)):
    """Chroma part of a square intra-family leaf — twin of the
    recon._make_leaf_fn chroma tail ((DM vs CCLM) x (separate vs JCCR)
    unified decision), on local blocks.  Returns (rec_cb, lev_cb, rec_cr,
    lev_cr, use_c, use_j)."""
    cs = s // 2
    cx2, cy2 = x // 2, y // 2
    oL, oC, oPc = offs
    mx = (1 << bd) - 1
    tcb, lcb_r = intra_pred.build_references(
        bcb, cx2, cy2, s=cs, is_luma=False, frame_w=frame_w // 2,
        frame_h=frame_h // 2, n_ctu_x=n_ctu_x, bd=bd, y_off=oC)
    pred_cb = intra_pred.predict(tcb, lcb_r, mode_dm, s=cs, is_luma=False,
                                 bd=bd)
    tcr, lcr_r = intra_pred.build_references(
        bcr, cx2, cy2, s=cs, is_luma=False, frame_w=frame_w // 2,
        frame_h=frame_h // 2, n_ctu_x=n_ctu_x, bd=bd, y_off=oC)
    pred_cr = intra_pred.predict(tcr, lcr_r, mode_dm, s=cs, is_luma=False,
                                 bd=bd)
    if not (cclm or jccr):
        rcb, lev_cb = _comp_local(scb, pred_cb, cx2, oPc + cy2, cs, cs, qp,
                                  bd, encode, rdoq, lam_rd, dq, crs_sc=sc)
        rcr, lev_cr = _comp_local(scr, pred_cr, cx2, oPc + cy2, cs, cs, qp,
                                  bd, encode, rdoq, lam_rd, dq, crs_sc=sc)
        return rcb, lev_cb, rcr, lev_cr, jnp.int32(0), jnp.int32(0)

    pred_opts = [(pred_cb, pred_cr)]
    if cclm:
        pred_opts.append((
            intra_pred.cclm_predict_local(by, bcb, rec_y, cx2, cy2, cs=cs,
                                          frame_w=frame_w, frame_h=frame_h,
                                          n_ctu_x=n_ctu_x, bd=bd,
                                          y_off_l=oL, y_off_c=oC),
            intra_pred.cclm_predict_local(by, bcr, rec_y, cx2, cy2, cs=cs,
                                          frame_w=frame_w, frame_h=frame_h,
                                          n_ctu_x=n_ctu_x, bd=bd,
                                          y_off_l=oL, y_off_c=oC)))
    if encode:
        bcbk = jax.lax.dynamic_slice(scb, (oPc + cy2, cx2),
                                     (cs, cs)).astype(jnp.int32)
        bcrk = jax.lax.dynamic_slice(scr, (oPc + cy2, cx2),
                                     (cs, cs)).astype(jnp.int32)
        (lev_cb, lev_cr, rcbb, rcrb, use_c, use_j) = recon.chroma_rd_j(
            bcbk, bcrk, pred_opts, sc, cs, qp, bd, rdoq, lam_rd, jccr, dq)
        return rcbb, lev_cb, rcrb, lev_cr, use_c, use_j

    # decode
    if cclm:
        use = cmode_in > 0
        pcb = jnp.where(use, pred_opts[1][0], pred_opts[0][0])
        pcr = jnp.where(use, pred_opts[1][1], pred_opts[0][1])
    else:
        pcb, pcr = pred_opts[0]
    lev_cb = jax.lax.dynamic_slice(scb, (oPc + cy2, cx2), (cs, cs))
    lev_cr = jax.lax.dynamic_slice(scr, (oPc + cy2, cx2), (cs, cs))
    rrj = transform.inverse_transform(
        transform.dequantize(lev_cb, cs, cs, qp, bd, dq=dq), cs, cs, bd=bd)
    if sc is not None:
        rrj = (rrj * sc) >> 11
        rrr2 = transform.inverse_transform(
            transform.dequantize(lev_cr, cs, cs, qp, bd, dq=dq), cs, cs,
            bd=bd)
        rcr_sep = jnp.clip(pcr + ((rrr2 * sc) >> 11), 0, mx)
    else:
        rcr_sep = transform.reconstruct(pcr, lev_cr, cs, cs, qp, bd=bd,
                                        dq=dq)
    rcbb = jnp.clip(pcb + rrj, 0, mx)
    if jccr:
        rcrb = jnp.where(jccr_in > 0, jnp.clip(pcr - rrj, 0, mx), rcr_sep)
    else:
        rcrb = rcr_sep
    return rcbb, lev_cb, rcrb, lev_cr, jnp.int32(0), jnp.int32(0)


def _batch_offs(rows, nf: int, frame_h: int):
    """Vector (oL, oC, oP, oPc, o8) scatter offsets for a batch's rows."""
    if nf == 1:
        return 0, 0, 0, 0, 0
    sly, slc, spy, spc, sp8 = _slabs(frame_h)
    fv = rows[:, 16]
    return fv * sly, fv * slc, fv * spy, fv * spc, fv * sp8


def _apply_sq(carry, rows, outs, s: int, encode: bool, planes: bool,
              chroma_flags: bool, nf: int = 1, frame_h: int = 0):
    """Scatter a square-leaf batch's outputs into the carry."""
    (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
     cmodep, jccrp, sbtp) = carry
    cs = s // 2
    xs, ys = rows[:, 1], rows[:, 2]
    oL, oC, oP, oPc, o8 = _batch_offs(rows, nf, frame_h)
    (rec_y, lev_y, rec_cb, lev_cb, rec_cr, lev_cr, midx, lidx, use_c,
     use_j) = outs
    by = _scatter(by, rec_y, xs, oL + ys, s, s, 1)
    bcb = _scatter(bcb, rec_cb, xs // 2, oC + ys // 2, cs, cs, 1)
    bcr = _scatter(bcr, rec_cr, xs // 2, oC + ys // 2, cs, cs, 1)
    if encode:
        ly = _scatter(ly, lev_y, xs, oP + ys, s, s, 0)
        lcb = _scatter(lcb, lev_cb, xs // 2, oPc + ys // 2, cs, cs, 0)
        lcr = _scatter(lcr, lev_cr, xs // 2, oPc + ys // 2, cs, cs, 0)
        if planes:
            mtsp = _scatter8(mtsp, midx, xs, ys, o8)
            lfnstp = _scatter8(lfnstp, lidx, xs, ys, o8)
        if chroma_flags:
            cmodep = _scatter8(cmodep, use_c, xs, ys, o8)
            jccrp = _scatter8(jccrp, use_j, xs, ys, o8)
    return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
            cmodep, jccrp, sbtp)


# ---------------------------------------------------------------------------
# device: batch kernels per leaf class
# ---------------------------------------------------------------------------

_STATICS = ("s", "frame_w", "frame_h", "bd", "encode", "mts", "lfnst",
            "cclm", "rdoq", "mip", "tskip", "jccr", "dq", "nf")


@functools.partial(jax.jit, static_argnames=_STATICS)
def _intra_batch(carry, rows, qp, lam_rd, crs_lut, *, s, frame_w, frame_h,
                 bd, encode, mts, lfnst, cclm, rdoq, mip, tskip, jccr, dq,
                 nf=1):
    by, bcb, bcr = carry[0], carry[1], carry[2]
    sy, scb, scr = carry[6], carry[7], carry[8]
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    num_reg = rom.NUM_LUMA_MODE
    mx = (1 << bd) - 1
    lam32 = jnp.asarray(lam_rd, jnp.int32)

    def one(row):
        x, y, mode = row[1], row[2], row[3]
        mts_in, lfnst_in, cmode_in = row[6], row[7], row[8]
        mrl_in, jccr_in = row[9], row[10]
        oL, oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        top, left = intra_pred.build_references(
            by, x, y, s=s, is_luma=True, frame_w=frame_w, frame_h=frame_h,
            n_ctu_x=n_ctu_x, bd=bd, ref_line=mrl_in, y_off=oL)
        mode_reg = jnp.minimum(mode, num_reg - 1)
        pred_y = intra_pred.predict(top, left, mode_reg, s=s, is_luma=True,
                                    bd=bd, ref_line=mrl_in)
        if mip:
            pred_y = jnp.where(
                mode >= num_reg,
                intra_pred.mip_predict_j(top, left, mode - num_reg, s=s,
                                         bd=bd),
                pred_y)
            mode_dm = jnp.where(mode >= num_reg, jnp.int32(rom.PLANAR_IDX),
                                mode)
        else:
            mode_dm = mode
        if mts or lfnst or tskip:
            if encode:
                blk = jax.lax.dynamic_slice(sy, (oP + y, x),
                                            (s, s)).astype(jnp.int32)
                midx, lidx, lev_y, rres = transform.choose_tx_j(
                    blk - pred_y, s, qp, lam32, mode_reg, bd, mts=mts,
                    lfnst=lfnst, rdoq=rdoq, dq=dq,
                    allow=(mode < num_reg) if mip else None, ts=tskip)
            else:
                midx = mts_in
                lidx = lfnst_in
                lev_y = jax.lax.dynamic_slice(sy, (oP + y, x), (s, s))
                dqc = transform.dequantize(lev_y, s, s, qp, bd, dq=dq)
                if lfnst:
                    dqc = transform.inv_lfnst_switch_j(dqc, lidx, mode_reg)
                branches_m = [
                    (lambda kh=kh, kv=kv: transform.inverse_transform(
                        dqc, s, s, kh, kv, bd))
                    for kh, kv in transform.MTS_SET]
                rres = jax.lax.switch(midx, branches_m)
            rec_y = jnp.clip(pred_y + rres, 0, mx)
        else:
            midx = jnp.int32(0)
            lidx = jnp.int32(0)
            rec_y, lev_y = _comp_local(sy, pred_y, x, oP + y, s, s, qp, bd,
                                       encode, rdoq, lam32, dq)
        sc = None
        if crs_lut is not None:
            sc = crs_lut[rec_y.sum() >> _CRS_SHIFT[s]]
        rcb, lev_cb, rcr, lev_cr, use_c, use_j = _chroma_leaf(
            by, bcb, bcr, scb, scr, rec_y, x, y, mode_dm, cmode_in, jccr_in,
            s=s, frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x, qp=qp,
            bd=bd, encode=encode, cclm=cclm, rdoq=rdoq, lam_rd=lam32,
            jccr=jccr, dq=dq, sc=sc, offs=(oL, oC, oPc))
        return (rec_y, lev_y, rcb, lev_cb, rcr, lev_cr, midx, lidx, use_c,
                use_j)

    outs = jax.vmap(one)(rows)
    return _apply_sq(carry, rows, outs, s, encode,
                     planes=(mts or lfnst or tskip),
                     chroma_flags=(cclm or jccr), nf=nf, frame_h=frame_h)


_ISP_STATICS = ("s", "d", "frame_w", "frame_h", "bd", "encode", "cclm",
                "rdoq", "jccr", "dq", "nf")


@functools.partial(jax.jit, static_argnames=_ISP_STATICS)
def _isp_batch(carry, rows, qp, lam_rd, crs_lut, *, s, d, frame_w, frame_h,
               bd, encode, cclm, rdoq, jccr, dq, nf=1):
    by, bcb, bcr = carry[0], carry[1], carry[2]
    sy, scb, scr = carry[6], carry[7], carry[8]
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    num_reg = rom.NUM_LUMA_MODE
    lam32 = jnp.asarray(lam_rd, jnp.int32)
    wn = 2 * s + 2

    def one(row):
        x, y, mode = row[1], row[2], row[3]
        cmode_in, jccr_in = row[8], row[10]
        oL, oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        mode_reg = jnp.minimum(mode, num_reg - 1)
        win = jax.lax.dynamic_slice(by, (oL + y, x), (wn, wn))
        lev_y = jnp.zeros((s, s), jnp.int32)
        for (dx2, dy2, w_st, h_st) in isp_parts(s, d):
            px, py = x + dx2, y + dy2
            tk, lk = intra_pred.build_references_rect_win(
                win, x, y, px, py, w=w_st, h=h_st, is_luma=True,
                frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd,
                win_n=wn, leaf_w=s, leaf_h=s)
            pred = intra_pred.predict_rect(tk, lk, mode_reg, w=w_st,
                                           h=h_st, is_luma=True, bd=bd)
            kh, kv = isp_kernels(w_st, h_st)
            if encode:
                blk = jax.lax.dynamic_slice(
                    sy, (oP + py, px), (h_st, w_st)).astype(jnp.int32)
                coef = transform.forward_transform(blk - pred, h_st, w_st,
                                                   kh, kv, bd)
                lev = transform.quantize(coef, h_st, w_st, qp, intra=True,
                                         bd=bd, rdoq=rdoq, lam_rd=lam32,
                                         dq=dq)
                lev_y = jax.lax.dynamic_update_slice(lev_y, lev, (dy2, dx2))
            else:
                lev = jax.lax.dynamic_slice(sy, (oP + py, px), (h_st, w_st))
            rec = transform.reconstruct(pred, lev, h_st, w_st, qp, kh, kv,
                                        bd, dq=dq)
            win = jax.lax.dynamic_update_slice(win, rec,
                                               (dy2 + 1, dx2 + 1))
        rec_y = win[1:s + 1, 1:s + 1]
        if not encode:
            lev_y = jax.lax.dynamic_slice(sy, (oP + y, x), (s, s))
        sc = None
        if crs_lut is not None:
            sc = crs_lut[rec_y.sum() >> _CRS_SHIFT[s]]
        rcb, lev_cb, rcr, lev_cr, use_c, use_j = _chroma_leaf(
            by, bcb, bcr, scb, scr, rec_y, x, y, mode_reg, cmode_in,
            jccr_in, s=s, frame_w=frame_w, frame_h=frame_h,
            n_ctu_x=n_ctu_x, qp=qp, bd=bd, encode=encode, cclm=cclm,
            rdoq=rdoq, lam_rd=lam32, jccr=jccr, dq=dq, sc=sc,
            offs=(oL, oC, oPc))
        return (rec_y, lev_y, rcb, lev_cb, rcr, lev_cr, jnp.int32(0),
                jnp.int32(0), use_c, use_j)

    outs = jax.vmap(one)(rows)
    return _apply_sq(carry, rows, outs, s, encode, planes=False,
                     chroma_flags=(cclm or jccr), nf=nf, frame_h=frame_h)


_RECT_STATICS = ("w", "h", "frame_w", "frame_h", "bd", "encode", "rdoq",
                 "dq", "nf")


@functools.partial(jax.jit, static_argnames=_RECT_STATICS)
def _rect_batch(carry, rows, qp, lam_rd, crs_lut, *, w, h, frame_w,
                frame_h, bd, encode, rdoq, dq, nf=1):
    by, bcb, bcr = carry[0], carry[1], carry[2]
    sy, scb, scr = carry[6], carry[7], carry[8]
    (by0, bcb0, bcr0, ly, lcb, lcr, sy0, scb0, scr0, mtsp, lfnstp,
     cmodep, jccrp, sbtp) = carry
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    cw, ch = w // 2, h // 2
    ps = max(w, h)
    lam32 = jnp.asarray(lam_rd, jnp.int32)

    def one(row):
        x, y, mode = row[1], row[2], row[3]
        oL, oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        px0 = x & ~(ps - 1)
        py0 = y & ~(ps - 1)
        top, left = intra_pred.build_references_rect(
            by, x, y, w=w, h=h, is_luma=True, frame_w=frame_w,
            frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd,
            leaf_x=px0, leaf_y=py0, leaf_w=ps, leaf_h=ps, y_off=oL)
        pred_y = intra_pred.predict_rect(top, left, mode, w=w, h=h,
                                         is_luma=True, bd=bd)
        rec_y, lev_y = _comp_local(sy, pred_y, x, oP + y, w, h, qp, bd,
                                   encode, rdoq, lam32, dq)
        sc = None
        if crs_lut is not None:
            sc = crs_lut[rec_y.sum() >> (_log2i(w) + _log2i(h))]
        tcb, lcb_r = intra_pred.build_references_rect(
            bcb, x // 2, y // 2, w=cw, h=ch, is_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            bd=bd, leaf_x=px0 // 2, leaf_y=py0 // 2, leaf_w=ps // 2,
            leaf_h=ps // 2, y_off=oC)
        pred_cb = intra_pred.predict_rect(tcb, lcb_r, mode, w=cw, h=ch,
                                          is_luma=False, bd=bd)
        rcb, lev_cb = _comp_local(scb, pred_cb, x // 2, oPc + y // 2, cw,
                                  ch, qp, bd, encode, rdoq, lam32, dq,
                                  crs_sc=sc)
        tcr, lcr_r = intra_pred.build_references_rect(
            bcr, x // 2, y // 2, w=cw, h=ch, is_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            bd=bd, leaf_x=px0 // 2, leaf_y=py0 // 2, leaf_w=ps // 2,
            leaf_h=ps // 2, y_off=oC)
        pred_cr = intra_pred.predict_rect(tcr, lcr_r, mode, w=cw, h=ch,
                                          is_luma=False, bd=bd)
        rcr, lev_cr = _comp_local(scr, pred_cr, x // 2, oPc + y // 2, cw,
                                  ch, qp, bd, encode, rdoq, lam32, dq,
                                  crs_sc=sc)
        return rec_y, lev_y, rcb, lev_cb, rcr, lev_cr

    rec_y, lev_y, rcb, lev_cb, rcr, lev_cr = jax.vmap(one)(rows)
    xs, ys = rows[:, 1], rows[:, 2]
    oL, oC, oP, oPc, _o8 = _batch_offs(rows, nf, frame_h)
    by0 = _scatter(by0, rec_y, xs, oL + ys, w, h, 1)
    bcb0 = _scatter(bcb0, rcb, xs // 2, oC + ys // 2, cw, ch, 1)
    bcr0 = _scatter(bcr0, rcr, xs // 2, oC + ys // 2, cw, ch, 1)
    if encode:
        ly = _scatter(ly, lev_y, xs, oP + ys, w, h, 0)
        lcb = _scatter(lcb, lev_cb, xs // 2, oPc + ys // 2, cw, ch, 0)
        lcr = _scatter(lcr, lev_cr, xs // 2, oPc + ys // 2, cw, ch, 0)
    return (by0, bcb0, bcr0, ly, lcb, lcr, sy0, scb0, scr0, mtsp, lfnstp,
            cmodep, jccrp, sbtp)


_IBC_STATICS = ("s", "frame_w", "frame_h", "bd", "encode", "rdoq", "dq",
                "nf")


@functools.partial(jax.jit, static_argnames=_IBC_STATICS)
def _ibc_batch(carry, rows, qp, lam_rd, *, s, frame_w, frame_h, bd, encode,
               rdoq, dq, nf=1):
    by, bcb, bcr = carry[0], carry[1], carry[2]
    sy, scb, scr = carry[6], carry[7], carry[8]
    cs = s // 2
    lam32 = jnp.asarray(lam_rd, jnp.int32)

    def one(row):
        x, y, bvx, bvy = row[1], row[2], row[4], row[5]
        oL, oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        sx = jnp.clip(x + bvx, 0, frame_w - s)
        sy0 = jnp.clip(y + bvy, 0, frame_h - s)
        pred_y = jax.lax.dynamic_slice(by, (oL + sy0 + 1, sx + 1), (s, s))
        pred_cb = jax.lax.dynamic_slice(
            bcb, (oC + sy0 // 2 + 1, sx // 2 + 1), (cs, cs))
        pred_cr = jax.lax.dynamic_slice(
            bcr, (oC + sy0 // 2 + 1, sx // 2 + 1), (cs, cs))
        rec_y, lev_y = _comp_local(sy, pred_y, x, oP + y, s, s, qp, bd,
                                   encode, rdoq, lam32, dq)
        rcb, lev_cb = _comp_local(scb, pred_cb, x // 2, oPc + y // 2, cs,
                                  cs, qp, bd, encode, rdoq, lam32, dq)
        rcr, lev_cr = _comp_local(scr, pred_cr, x // 2, oPc + y // 2, cs,
                                  cs, qp, bd, encode, rdoq, lam32, dq)
        return (rec_y, lev_y, rcb, lev_cb, rcr, lev_cr, jnp.int32(0),
                jnp.int32(0), jnp.int32(0), jnp.int32(0))

    outs = jax.vmap(one)(rows)
    return _apply_sq(carry, rows, outs, s, encode, planes=False,
                     chroma_flags=False, nf=nf, frame_h=frame_h)


@functools.partial(jax.jit, static_argnames=("s", "nf", "frame_h"))
def _plt_batch(carry, rows, plt_y, plt_cb, plt_cr, *, s, nf=1, frame_h=0):
    cs = s // 2

    def one(row):
        x, y = row[1], row[2]
        _oL, _oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        blk = jax.lax.dynamic_slice(plt_y, (oP + y, x), (s, s))
        bb = jax.lax.dynamic_slice(plt_cb, (oPc + y // 2, x // 2), (cs, cs))
        br = jax.lax.dynamic_slice(plt_cr, (oPc + y // 2, x // 2), (cs, cs))
        return blk, bb, br

    blk, bb, br = jax.vmap(one)(rows)
    (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
     cmodep, jccrp, sbtp) = carry
    xs, ys = rows[:, 1], rows[:, 2]
    oL, oC, _oP, _oPc, _o8 = _batch_offs(rows, nf, frame_h)
    by = _scatter(by, blk, xs, oL + ys, s, s, 1)
    bcb = _scatter(bcb, bb, xs // 2, oC + ys // 2, cs, cs, 1)
    bcr = _scatter(bcr, br, xs // 2, oC + ys // 2, cs, cs, 1)
    return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
            cmodep, jccrp, sbtp)


_CIIP_STATICS = ("s", "frame_w", "frame_h", "bd", "encode", "rdoq", "dq",
                 "nf")


@functools.partial(jax.jit, static_argnames=_CIIP_STATICS)
def _ciip_batch(carry, rows, refs, qp, lam_rd, fwd_lut, crs_lut, rox, roy,
                *, s, frame_w, frame_h, bd, encode, rdoq, dq, nf=1):
    from ..pipeline.recon import _slab_strides
    by, bcb, bcr = carry[0], carry[1], carry[2]
    sy, scb, scr = carry[6], carry[7], carry[8]
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    cs = s // 2
    mx = (1 << bd) - 1
    lam32 = jnp.asarray(lam_rd, jnp.int32)
    bcw_w = jnp.asarray(np.asarray(BCW_W, np.int32))
    slr, slrc, _spy, _spc, _sp8 = _slab_strides(frame_h)

    def one(row):
        x, y = row[1], row[2]
        mvx, mvy, m1x, m1y = row[4], row[5], row[11], row[12]
        dd, wdx = row[13], row[14]
        oL, oC, oP, oPc, _o8 = _row_offs(row, nf, frame_h)
        fidx = row[16] if nf > 1 else 0
        oR = fidx * slr
        oRc = fidx * slrc
        w = bcw_w[jnp.clip(wdx, 0, 2)]

        def mcpred(r0, r1, px, py, sz, luma):
            f = mc.mc_luma_block if luma else mc.mc_chroma_block
            ox = rox if luma else rox // 2
            oy = (roy + oR) if luma else (roy // 2 + oRc)
            p0 = f(r0, px + ox, py + oy, sz, mvx, mvy, bd)
            p1 = f(r1, px + ox, py + oy, sz, m1x, m1y, bd)
            avg = jnp.clip((w * p0 + (8 - w) * p1 + 4) >> 3, 0, mx)
            return jnp.where(dd == 0, p0, jnp.where(dd == 1, p1, avg))

        def blend(mc_p, buf, px, py, sz, luma, yo):
            top, left = intra_pred.build_references(
                buf, px, py, s=sz, is_luma=luma,
                frame_w=frame_w if luma else frame_w // 2,
                frame_h=frame_h if luma else frame_h // 2,
                n_ctu_x=n_ctu_x, bd=bd, y_off=yo)
            pl = intra_pred.predict(top, left, jnp.int32(rom.PLANAR_IDX),
                                    s=sz, is_luma=luma, bd=bd)
            return jnp.clip((mc_p + pl + 1) >> 1, 0, mx)

        pred_y = mcpred(refs[0], refs[3], x, y, s, True)
        if fwd_lut is not None:
            pred_y = jnp.take(fwd_lut, pred_y)
        pred_y = blend(pred_y, by, x, y, s, True, oL)
        pred_cb = blend(mcpred(refs[1], refs[4], x // 2, y // 2, cs, False),
                        bcb, x // 2, y // 2, cs, False, oC)
        pred_cr = blend(mcpred(refs[2], refs[5], x // 2, y // 2, cs, False),
                        bcr, x // 2, y // 2, cs, False, oC)
        rec_y, lev_y = _comp_local(sy, pred_y, x, oP + y, s, s, qp, bd,
                                   encode, rdoq, lam32, dq)
        sc = None
        if crs_lut is not None:
            sc = crs_lut[rec_y.sum() >> _CRS_SHIFT[s]]
        rcb, lev_cb = _comp_local(scb, pred_cb, x // 2, oPc + y // 2, cs,
                                  cs, qp, bd, encode, rdoq, lam32, dq,
                                  crs_sc=sc)
        rcr, lev_cr = _comp_local(scr, pred_cr, x // 2, oPc + y // 2, cs,
                                  cs, qp, bd, encode, rdoq, lam32, dq,
                                  crs_sc=sc)
        return (rec_y, lev_y, rcb, lev_cb, rcr, lev_cr, jnp.int32(0),
                jnp.int32(0), jnp.int32(0), jnp.int32(0))

    outs = jax.vmap(one)(rows)
    return _apply_sq(carry, rows, outs, s, encode, planes=False,
                     chroma_flags=False, nf=nf, frame_h=frame_h)


# ---------------------------------------------------------------------------
# fused scan-over-waves: ONE jit per (geometry, toolset) executing the whole
# wave schedule as lax.scan over fixed-size wave chunks with a lax.switch
# over leaf-class branches (reusing the per-class batch bodies above).
# Fixes both failure modes of the per-batch dispatch driver: O(waves)
# device round-trips and one XLA compilation per distinct batch shape.
# ---------------------------------------------------------------------------

_STEP_PAD = 32         # schedule length bucket (bounds recompiles)


def _fused_classes(*, isp, mtt, ibc, plt, ciip):
    """Static ordered class list; index 0 is the no-op branch."""
    classes = [("nop", 0, 0, 0),
               ("intra", 8, 8, 0), ("intra", 16, 16, 0),
               ("intra", 32, 32, 0)]
    if isp:
        classes += [("isp", s, s, d) for s in (8, 16, 32) for d in (1, 2)]
    if mtt:
        classes += [("rect", w, h, 0) for (w, h) in planmod.RECT_SHAPES]
    if ibc:
        classes += [("ibc", s, s, 0) for s in (8, 16, 32)]
    if plt:
        classes += [("plt", s, s, 0) for s in (8, 16, 32)]
    if ciip:
        classes += [("ciip", s, s, 0) for s in (8, 16, 32)]
    return tuple(classes)


def _fused_schedule(slots_np, frame_h, frame_w, classes):
    """(wcls (n,) int32, wrows (n, K, 16) int32) from the wave schedule,
    chunked to a pow-2 K chosen from the frame pixel count (small frames
    don't pay wide vmap lanes for mean-4 waves while 1080p frames get fat
    batches) and padded to a pow-2 step-count bucket (>= _STEP_PAD)."""
    cls_idx = {c: i for i, c in enumerate(classes)}
    sched = build_schedule(slots_np, frame_h, frame_w)
    for cls, _rows in sched:
        if cls not in cls_idx:      # flag/slot disagreement: fail loudly
            raise ValueError(
                f"wave schedule contains leaf class {cls!r} but the "
                f"corresponding tool flag is off (enabled: {classes})")
    # K depends only on the geometry (NOT the per-frame schedule): a
    # per-frame K would recompile _fused_scan every frame.  Wider K was
    # measured SLOWER single-frame (1080p wave groups average ~11 leaves,
    # so extra lanes burn compute on dummies — frame_wave_batch is the
    # occupancy lever).  VVCTPU_FUSED_K overrides for A/B runs.
    import os
    env_k = os.environ.get("VVCTPU_FUSED_K")
    px = frame_h * frame_w
    K = 4 if px <= (1 << 18) else 8 if px <= (1 << 20) else 16
    if env_k:
        K = int(env_k)
    ncol = slots_np.shape[1]
    wcls, wrows = [], []
    for cls, rows in sched:
        ci = cls_idx[cls]
        for c0 in range(0, rows.shape[0], K):
            chunk = rows[c0:c0 + K]
            if chunk.shape[0] < K:
                pad = np.zeros((K - chunk.shape[0], ncol), np.int32)
                pad[:, 1] = pad[:, 2] = 1 << 20
                chunk = np.concatenate([chunk, pad], axis=0)
            wcls.append(ci)
            wrows.append(chunk)
    n = len(wcls)
    # pad the step count to a power-of-2 bucket (>= _STEP_PAD): the scan
    # length is baked into the compiled program, so fine-grained padding
    # would recompile on every frame's schedule wobble
    n_pad = _STEP_PAD
    while n_pad < n:
        n_pad *= 2
    dummy = np.zeros((K, ncol), np.int32)
    dummy[:, 1] = dummy[:, 2] = 1 << 20
    for _ in range(n_pad - n):
        wcls.append(0)
        wrows.append(dummy)
    return (np.asarray(wcls, np.int32), np.stack(wrows).astype(np.int32))


_FUSED_STATICS = ("classes", "frame_w", "frame_h", "bd", "encode", "mts",
                  "lfnst", "cclm", "rdoq", "mip", "tskip", "jccr", "dq",
                  "nf")


@functools.partial(jax.jit, static_argnames=_FUSED_STATICS)
def _fused_scan(carry, wcls, wrows, qp, lam_rd, crs_lut, fwd_lut, refs,
                rox, roy, plt_planes, *, classes, frame_w, frame_h, bd,
                encode, mts, lfnst, cclm, rdoq, mip, tskip, jccr, dq,
                nf=1):
    qp32 = jnp.asarray(qp, jnp.int32)
    lam32 = jnp.asarray(lam_rd, jnp.int32)
    branches = []
    for (kind, w, h, d) in classes:
        if kind == "nop":
            branches.append(lambda c, r: c)
        elif kind == "intra":
            branches.append(functools.partial(
                lambda c, r, s: _intra_batch.__wrapped__(
                    c, r, qp32, lam32, crs_lut, s=s, frame_w=frame_w,
                    frame_h=frame_h, bd=bd, encode=encode, mts=mts,
                    lfnst=lfnst, cclm=cclm, rdoq=rdoq, mip=mip,
                    tskip=tskip, jccr=jccr, dq=dq, nf=nf), s=w))
        elif kind == "isp":
            branches.append(functools.partial(
                lambda c, r, s, d2: _isp_batch.__wrapped__(
                    c, r, qp32, lam32, crs_lut, s=s, d=d2, frame_w=frame_w,
                    frame_h=frame_h, bd=bd, encode=encode, cclm=cclm,
                    rdoq=rdoq, jccr=jccr, dq=dq, nf=nf), s=w, d2=d))
        elif kind == "rect":
            branches.append(functools.partial(
                lambda c, r, w2, h2: _rect_batch.__wrapped__(
                    c, r, qp32, lam32, crs_lut, w=w2, h=h2,
                    frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode,
                    rdoq=rdoq, dq=dq, nf=nf), w2=w, h2=h))
        elif kind == "ibc":
            branches.append(functools.partial(
                lambda c, r, s: _ibc_batch.__wrapped__(
                    c, r, qp32, lam32, s=s, frame_w=frame_w,
                    frame_h=frame_h, bd=bd, encode=encode, rdoq=rdoq,
                    dq=dq, nf=nf), s=w))
        elif kind == "plt":
            branches.append(functools.partial(
                lambda c, r, s: _plt_batch.__wrapped__(
                    c, r, plt_planes[0], plt_planes[1], plt_planes[2],
                    s=s, nf=nf, frame_h=frame_h), s=w))
        elif kind == "ciip":
            branches.append(functools.partial(
                lambda c, r, s: _ciip_batch.__wrapped__(
                    c, r, refs, qp32, lam32, fwd_lut, crs_lut, rox, roy,
                    s=s, frame_w=frame_w, frame_h=frame_h, bd=bd,
                    encode=encode, rdoq=rdoq, dq=dq), s=w))
        else:  # pragma: no cover
            raise AssertionError(kind)

    def step(c, xs):
        ci, rows = xs
        return jax.lax.switch(ci, branches, c, rows), None

    carry, _ = jax.lax.scan(step, carry, (wcls, wrows))
    return carry


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def frame_wave(slots, planes_y, planes_cb, planes_cr, *, frame_w: int,
               frame_h: int, qp, bd: int, encode: bool,
               inter_enabled: bool = False, ref_y=None, ref_cb=None,
               ref_cr=None, ref1_y=None, ref1_cb=None, ref1_cr=None,
               inter8=None, inter16=None, inter32=None,
               mts: bool = False, lfnst: bool = False, cclm: bool = False,
               rdoq: bool = False, lmcs: bool = False, lam_rd=0,
               fwd_lut=None, mip: bool = False, tskip: bool = False,
               jccr: bool = False, dmvr: bool = False, bdof: bool = False,
               ciip: bool = False, sbt: bool = False, crs_lut=None,
               isp: bool = False, gpm: bool = False,
               affine: bool = False, dq: bool = False, mtt: bool = False,
               rect16x8=None, rect8x16=None, rect32x16=None,
               rect16x32=None, rect32x8=None, rect8x32=None,
               ref_off_x=0, ref_off_y=0,
               ibc: bool = False, plt_y=None, plt_cb=None, plt_cr=None):
    """Drop-in twin of recon.frame_scan executing phase B as dependency
    waves (see module docstring).  Same signature, same returns, same
    bytes."""
    slots_np = np.asarray(slots)
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    h2, w2 = frame_h // 2, frame_w // 2

    def mkbuf(h, w):
        return jnp.zeros((h + 1 + MARGIN, w + 1 + MARGIN), jnp.int32)

    carry = (mkbuf(frame_h, frame_w), mkbuf(h2, w2), mkbuf(h2, w2),
             jnp.zeros((frame_h, frame_w), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             jnp.asarray(planes_y, jnp.int32),
             jnp.asarray(planes_cb, jnp.int32),
             jnp.asarray(planes_cr, jnp.int32),
             jnp.zeros((frame_h // 8, frame_w // 8), jnp.int32),
             jnp.zeros((frame_h // 8, frame_w // 8), jnp.int32),
             jnp.zeros((frame_h // 8, frame_w // 8), jnp.int32),
             jnp.zeros((frame_h // 8, frame_w // 8), jnp.int32),
             jnp.zeros((frame_h // 8, frame_w // 8), jnp.int32))

    if ref1_y is None:
        ref1_y, ref1_cb, ref1_cr = ref_y, ref_cb, ref_cr
    refs = (ref_y, ref_cb, ref_cr, ref1_y, ref1_cb, ref1_cr)
    rox = jnp.asarray(ref_off_x, jnp.int32)
    roy = jnp.asarray(ref_off_y, jnp.int32)
    if inter_enabled:
        rect_all = (((16, 8), rect16x8), ((8, 16), rect8x16),
                    ((32, 16), rect32x16), ((16, 32), rect16x32),
                    ((32, 8), rect32x8), ((8, 32), rect8x32))
        rect_list = tuple(sh for sh, ib in rect_all
                          if mtt and ib is not None)
        rects = tuple(jnp.asarray(ib) for sh, ib in rect_all
                      if mtt and ib is not None)
        carry = _phase_a_jit(
            carry, (jnp.asarray(inter8), jnp.asarray(inter16),
                    jnp.asarray(inter32)), rects, refs, np.int32(qp),
            np.int32(lam_rd), fwd_lut, crs_lut, rox, roy,
            s_list=(8, 16, 32), rect_list=rect_list, frame_w=frame_w,
            frame_h=frame_h, bd=bd, encode=encode, rdoq=rdoq, dmvr=dmvr,
            bdof=bdof, sbt=sbt, gpm=gpm, affine=affine, dq=dq, lmcs=lmcs,
            nf=1)

    crs = crs_lut if lmcs else None
    import os
    if os.environ.get("VVCTPU_WAVE_BATCH"):
        # legacy per-batch dispatch driver (A/B reference)
        qp32 = np.int32(qp)
        lam32 = np.int32(lam_rd)
        for cls, rows_np in build_schedule(slots_np, frame_h, frame_w):
            kind, w, h, d = cls
            rows = jnp.asarray(_pad_rows(rows_np))
            if kind == "intra":
                carry = _intra_batch(
                    carry, rows, qp32, lam32, crs, s=w, frame_w=frame_w,
                    frame_h=frame_h, bd=bd, encode=encode, mts=mts,
                    lfnst=lfnst, cclm=cclm, rdoq=rdoq, mip=mip,
                    tskip=tskip, jccr=jccr, dq=dq)
            elif kind == "isp":
                carry = _isp_batch(
                    carry, rows, qp32, lam32, crs, s=w, d=d,
                    frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode,
                    cclm=cclm, rdoq=rdoq, jccr=jccr, dq=dq)
            elif kind == "rect":
                carry = _rect_batch(
                    carry, rows, qp32, lam32, crs, w=w, h=h,
                    frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode,
                    rdoq=rdoq, dq=dq)
            elif kind == "ibc":
                carry = _ibc_batch(
                    carry, rows, qp32, lam32, s=w, frame_w=frame_w,
                    frame_h=frame_h, bd=bd, encode=encode, rdoq=rdoq,
                    dq=dq)
            elif kind == "plt":
                carry = _plt_batch(carry, rows, jnp.asarray(plt_y),
                                   jnp.asarray(plt_cb),
                                   jnp.asarray(plt_cr), s=w)
            elif kind == "ciip":
                carry = _ciip_batch(
                    carry, rows, refs, qp32, lam32,
                    fwd_lut if lmcs else None, crs, rox, roy, s=w,
                    frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode,
                    rdoq=rdoq, dq=dq)
            else:  # pragma: no cover
                raise AssertionError(cls)
    elif (os.environ.get("VVCTPU_SWITCH_SCAN")
          or (frame_h * frame_w < (1 << 20)
              and not os.environ.get("VVCTPU_UNIFORM_SCAN"))):
        # fused lax.switch engine — default at sub-HD sizes: the uniform
        # engine runs one sub-batch of EVERY class per step, which costs
        # ~3x at CIF wave sizes (r3 cfg1 regression 3.17->1.28 fps); the
        # switch engine executes only the level's live class.  At HD+ the
        # per-switch conditional buffer traffic (~0.6 ms) dominates and
        # the uniform engine below wins.  VVCTPU_SWITCH_SCAN /
        # VVCTPU_UNIFORM_SCAN force either (A/B reference).
        classes = _fused_classes(isp=isp, mtt=mtt, ibc=ibc,
                                 plt=plt_y is not None,
                                 ciip=ciip and inter_enabled)
        wcls, wrows = _fused_schedule(slots_np, frame_h, frame_w, classes)
        plt_planes = ((jnp.asarray(plt_y), jnp.asarray(plt_cb),
                       jnp.asarray(plt_cr)) if plt_y is not None
                      else (jnp.zeros((1, 1), jnp.int32),) * 3)
        carry = _fused_scan(
            carry, jnp.asarray(wcls), jnp.asarray(wrows),
            np.int32(qp), np.int32(lam_rd), crs,
            fwd_lut if lmcs else None, refs, rox, roy, plt_planes,
            classes=classes, frame_w=frame_w, frame_h=frame_h, bd=bd,
            encode=encode, mts=mts, lfnst=lfnst, cclm=cclm, rdoq=rdoq,
            mip=mip, tskip=tskip, jccr=jccr, dq=dq)
    else:
        # switch-free uniform-step engine (default)
        all_classes = _fused_classes(isp=isp, mtt=mtt, ibc=ibc,
                                     plt=plt_y is not None,
                                     ciip=ciip and inter_enabled)
        classes = tuple(c for c in all_classes if c[0] != "nop")
        kmap = _uniform_kmap(classes, 1, frame_h * frame_w)
        _n, rows_map = _uniform_schedule([slots_np], frame_h, frame_w,
                                         classes, kmap)
        plt_planes = ((jnp.asarray(plt_y), jnp.asarray(plt_cb),
                       jnp.asarray(plt_cr)) if plt_y is not None
                      else (jnp.zeros((1, 1), jnp.int32),) * 3)
        carry = _uniform_scan(
            carry, tuple(jnp.asarray(rows_map[c]) for c in classes),
            np.int32(qp), np.int32(lam_rd), crs,
            fwd_lut if lmcs else None, refs, rox, roy, plt_planes,
            classes=classes, frame_w=frame_w, frame_h=frame_h, bd=bd,
            encode=encode, mts=mts, lfnst=lfnst, cclm=cclm, rdoq=rdoq,
            mip=mip, tskip=tskip, jccr=jccr, dq=dq, nf=1)

    by, bcb, bcr, ly, lcb, lcr = carry[:6]
    return (by[1:frame_h + 1, 1:frame_w + 1],
            bcb[1:h2 + 1, 1:w2 + 1], bcr[1:h2 + 1, 1:w2 + 1],
            ly, lcb, lcr, carry[9], carry[10], carry[11], carry[12],
            carry[13])


# ---------------------------------------------------------------------------
# frame-batched execution: merge several frames' wave schedules so each scan
# step packs leaves from every frame.  The intra dependency chain caps a
# single 1080p frame's anti-chains at ~10-20 leaves (measured), far below
# the VPU's appetite; independent frames (AI, or same-temporal-layer B's)
# multiply the fill N-fold at identical step count.  Frames live in one
# vertically-stacked buffer (one slab per frame, col-16 frame index in the
# slot rows selects the slab offset) so the single-frame leaf bodies serve
# unchanged — bit-exact per frame vs frame_wave (tests/test_wave_batch.py).
# ---------------------------------------------------------------------------


def frame_wave_batch(frames_in, *, frame_w: int, frame_h: int, qp, bd: int,
                     encode: bool, mts: bool = False, lfnst: bool = False,
                     cclm: bool = False, rdoq: bool = False,
                     lmcs: bool = False, lam_rd=0, fwd_lut=None,
                     mip: bool = False, tskip: bool = False,
                     jccr: bool = False, crs_lut=None, isp: bool = False,
                     dq: bool = False, mtt: bool = False,
                     ibc: bool = False, ciip: bool = False,
                     dmvr: bool = False, bdof: bool = False,
                     sbt: bool = False, gpm: bool = False,
                     affine: bool = False, **_unused):
    """Batched intra-frame wavefront over F independent frames.

    frames_in: list of dicts {slots, py, pcb, pcr [, plt (3 planes)]}.
    All frames share geometry and toolset; inter/CIIP classes are not
    supported here (AI or the intra part of a layer batch).  LMCS luts are
    shared across the batch (one model per call) — the callers batch only
    frames coded with the same slice toolset; per-frame LMCS models fall
    back to single-frame calls.  Returns a list of per-frame 11-tuples
    exactly like frame_wave."""
    from . import plan as planmod
    from . import recon as reconmod
    F = len(frames_in)
    sly, slc, spy, spc, sp8 = _slabs(frame_h)
    h2, w2 = frame_h // 2, frame_w // 2
    has_plt = any(fr.get("plt") is not None for fr in frames_in)
    inter_enabled = any(fr.get("refs") is not None for fr in frames_in)
    all_classes = _fused_classes(isp=isp, mtt=mtt, ibc=ibc, plt=has_plt,
                                 ciip=ciip and inter_enabled)
    classes = tuple(c for c in all_classes if c[0] != "nop")
    kmap = _uniform_kmap(classes, F, frame_h * frame_w)
    _n, rows_map = _uniform_schedule(
        [fr["slots"] for fr in frames_in], frame_h, frame_w, classes, kmap)

    def stackp(key, hh):
        return jnp.asarray(np.concatenate(
            [np.asarray(fr[key]) for fr in frames_in]).astype(np.int32))

    def mkbuf(h, w):
        return jnp.zeros((F * h, w + 1 + MARGIN), jnp.int32)

    carry = (mkbuf(sly, frame_w), mkbuf(slc, w2), mkbuf(slc, w2),
             jnp.zeros((F * spy, frame_w), jnp.int32),
             jnp.zeros((F * spc, w2), jnp.int32),
             jnp.zeros((F * spc, w2), jnp.int32),
             stackp("py", spy), stackp("pcb", spc), stackp("pcr", spc),
             jnp.zeros((F * sp8, frame_w // 8), jnp.int32),
             jnp.zeros((F * sp8, frame_w // 8), jnp.int32),
             jnp.zeros((F * sp8, frame_w // 8), jnp.int32),
             jnp.zeros((F * sp8, frame_w // 8), jnp.int32),
             jnp.zeros((F * sp8, frame_w // 8), jnp.int32))
    if has_plt:
        zl = np.zeros((spy, frame_w), np.int32)
        zc = np.zeros((spc, w2), np.int32)
        plt_planes = tuple(jnp.asarray(np.concatenate(
            [np.asarray(fr["plt"][i]) if fr.get("plt") is not None
             else (zl if i == 0 else zc) for fr in frames_in]))
            for i in range(3))
    else:
        plt_planes = (jnp.zeros((1, 1), jnp.int32),) * 3
    z = jnp.zeros((1, 1), jnp.int32)
    refs = (z, z, z, z, z, z)
    if inter_enabled:
        # refs may be device-resident (DPB) — concatenate on device
        refs = tuple(jnp.concatenate(
            [jnp.asarray(fr["refs"][i]) for fr in frames_in])
            for i in range(6))

        # phase A: all frames' inter leaves of a size in ONE batched pass
        inters = tuple(jnp.asarray(np.concatenate(
            [np.concatenate([fr["inter"][s_sz],
                             np.full((fr["inter"][s_sz].shape[0], 1), f,
                                     np.int32)], axis=1)
             for f, fr in enumerate(frames_in)])) for s_sz in (8, 16, 32))
        rect_list = tuple(planmod.RECT_SHAPES) if mtt else ()
        rects = tuple(jnp.asarray(np.concatenate(
            [np.concatenate([fr["rect"][sh],
                             np.full((fr["rect"][sh].shape[0], 1), f,
                                     np.int32)], axis=1)
             for f, fr in enumerate(frames_in)])) for sh in rect_list)
        carry = _phase_a_jit(
            carry, inters, rects, refs, np.int32(qp), np.int32(lam_rd),
            fwd_lut, crs_lut, jnp.int32(0), jnp.int32(0),
            s_list=(8, 16, 32), rect_list=rect_list, frame_w=frame_w,
            frame_h=frame_h, bd=bd, encode=encode, rdoq=rdoq, dmvr=dmvr,
            bdof=bdof, sbt=sbt, gpm=gpm, affine=affine, dq=dq, lmcs=lmcs,
            nf=F)
    crs = crs_lut if lmcs else None
    carry = _uniform_scan(
        carry, tuple(jnp.asarray(rows_map[c]) for c in classes),
        np.int32(qp), np.int32(lam_rd), crs, fwd_lut if lmcs else None,
        refs, jnp.int32(0), jnp.int32(0), plt_planes, classes=classes,
        frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode, mts=mts,
        lfnst=lfnst, cclm=cclm, rdoq=rdoq, mip=mip, tskip=tskip,
        jccr=jccr, dq=dq, nf=F)
    by, bcb, bcr, ly, lcb, lcr = carry[:6]
    outs = []
    for f in range(F):
        oL, oC, oP, oPc, o8 = (f * sly, f * slc, f * spy, f * spc,
                               f * sp8)
        outs.append((
            by[oL + 1:oL + frame_h + 1, 1:frame_w + 1],
            bcb[oC + 1:oC + h2 + 1, 1:w2 + 1],
            bcr[oC + 1:oC + h2 + 1, 1:w2 + 1],
            ly[oP:oP + frame_h], lcb[oPc:oPc + h2], lcr[oPc:oPc + h2],
            carry[9][o8:o8 + sp8], carry[10][o8:o8 + sp8],
            carry[11][o8:o8 + sp8], carry[12][o8:o8 + sp8],
            carry[13][o8:o8 + sp8]))
    return outs


# ---------------------------------------------------------------------------
# switch-free "uniform step" engine: profiling showed each lax.switch
# execution inside the fused scan costs ~0.6 ms (conditional buffer
# traffic), 5x the actual leaf-batch compute (~0.13 ms).  Here every scan
# step unconditionally applies ONE fixed-width sub-batch of EVERY enabled
# leaf class — leaves at the same dependency level are mutually
# independent by construction (a dependency forces level+1), so the
# in-step class order is irrelevant; absent classes ride as dummy rows
# (x = y = 2^20, scatter-dropped).  Steps per level = max over classes of
# that level's chunk count.  Works single-frame and frame-batched.
# ---------------------------------------------------------------------------


def _uniform_kmap(classes, F: int, px: int):
    """Static per-class chunk widths: the square-intra classes carry most
    leaves; everything else is rare.  Scaled by the frame-batch factor F
    and frame size, pow-2, capped (VMEM)."""
    base = 4 if px <= (1 << 18) else 8 if px <= (1 << 20) else 16

    def pow2(v, cap):
        k = 1
        while k < min(cap, v):
            k *= 2
        return k

    kmap = {}
    for cls in classes:
        kind = cls[0]
        if kind == "nop":
            continue
        if kind == "intra":
            kmap[cls] = pow2(base * F, 32)
        else:
            kmap[cls] = pow2(max(2, base // 2) * F, 16)
    return kmap


def _uniform_schedule(slot_list, frame_h, frame_w, classes, kmap):
    """Per-class stacked row tensors for the uniform engine.

    Returns (n_steps, {cls: (n_steps, K_cls, 17) int32}).  Rows carry the
    frame index in column 16 (0 when single-frame)."""
    per_level: dict = {}
    for f, s16 in enumerate(slot_list):
        lv = _levels_c(s16, frame_h, frame_w)
        if lv is None:
            lv = _levels_py(s16, frame_h, frame_w)
        sel = np.nonzero(lv > 0)[0]
        ops = s16[sel, 0]
        ips = np.where((ops >= 1) & (ops <= 3), s16[sel, 15], 0)
        W, H, _, KIND = _OPT
        kind = np.where(ips > 0, _KIND_RANK["isp"], KIND[ops])
        d = np.where(ips > 0, ips, 0)
        inv_kind = {v: k for k, v in _KIND_RANK.items()}
        rows = np.concatenate(
            [s16[sel], np.full((sel.size, 1), f, np.int32)], axis=1)
        lvv = lv[sel]
        key = (kind.astype(np.int64) << 24) | (W[ops].astype(np.int64)
                                               << 16) \
            | (H[ops].astype(np.int64) << 8) | d.astype(np.int64)
        for lvl in np.unique(lvv):
            m = lvv == lvl
            for k in np.unique(key[m]):
                cls = (inv_kind[(int(k) >> 24) & 0xFF],
                       (int(k) >> 16) & 0xFF, (int(k) >> 8) & 0xFF,
                       int(k) & 0xFF)
                per_level.setdefault(int(lvl), {}).setdefault(
                    cls, []).append(rows[m & (key == k)])
    for cls_groups in per_level.values():
        for cls in cls_groups:
            if cls not in kmap:
                raise ValueError(
                    f"uniform schedule has class {cls!r} but its tool "
                    f"flag is off (enabled: {list(kmap)})")
    # lay levels out into steps
    steps_rows = {cls: [] for cls in kmap}
    for lvl in sorted(per_level):
        groups = {c: np.concatenate(v) for c, v in per_level[lvl].items()}
        n_sub = max(-(-g.shape[0] // kmap[c]) for c, g in groups.items())
        for i in range(n_sub):
            for cls, K in kmap.items():
                g = groups.get(cls)
                chunk = (g[i * K:(i + 1) * K] if g is not None
                         else np.zeros((0, 17), np.int32))
                if chunk.shape[0] < K:
                    pad = np.zeros((K - chunk.shape[0], 17), np.int32)
                    pad[:, 1] = pad[:, 2] = 1 << 20
                    chunk = np.concatenate([chunk, pad], axis=0)
                steps_rows[cls].append(chunk)
    n = len(next(iter(steps_rows.values()))) if steps_rows else 0
    n_pad = _STEP_PAD
    while n_pad < n:
        n_pad *= 2
    for cls, K in kmap.items():
        dummy = np.zeros((K, 17), np.int32)
        dummy[:, 1] = dummy[:, 2] = 1 << 20
        steps_rows[cls].extend([dummy] * (n_pad - n))
    return n_pad, {c: np.stack(v).astype(np.int32)
                   for c, v in steps_rows.items()}


_PHASE_A_STATICS = ("s_list", "rect_list", "frame_w", "frame_h", "bd",
                    "encode", "rdoq", "dmvr", "bdof", "sbt", "gpm",
                    "affine", "dq", "lmcs", "nf")


@functools.partial(jax.jit, static_argnames=_PHASE_A_STATICS)
def _phase_a_jit(carry, inters, rects, refs, qp, lam_rd, fwd_lut, crs_lut,
                 rox, roy, *, s_list, rect_list, frame_w, frame_h, bd,
                 encode, rdoq, dmvr, bdof, sbt, gpm, affine, dq, lmcs,
                 nf=1):
    """All phase-A inter passes under ONE jit (they ran eagerly before —
    hundreds of per-op dispatches per frame)."""
    lam32 = jnp.asarray(lam_rd, jnp.int32)
    for ib, s_sz in zip(inters, s_list):
        carry = recon._inter_batch_pass(
            carry, ib, refs, s_sz, qp, bd, encode, frame_w, frame_h,
            rdoq, lam32, fwd_lut if lmcs else None, dmvr=dmvr, bdof=bdof,
            sbt=sbt, crs_lut=crs_lut if lmcs else None, gpm=gpm,
            affine=affine, dq=dq, rox=rox, roy=roy, nf=nf,
            frame_h_s=frame_h)
    for ib, (rw, rh) in zip(rects, rect_list):
        carry = recon._inter_batch_pass_rect(
            carry, ib, refs, rw, rh, qp, bd, encode, rdoq, lam32,
            fwd_lut if lmcs else None,
            crs_lut=crs_lut if lmcs else None, dq=dq, rox=rox, roy=roy,
            nf=nf, frame_h_s=frame_h)
    return carry


_UNIFORM_STATICS = ("classes", "frame_w", "frame_h", "bd", "encode", "mts",
                    "lfnst", "cclm", "rdoq", "mip", "tskip", "jccr", "dq",
                    "nf")


@functools.partial(jax.jit, static_argnames=_UNIFORM_STATICS)
def _uniform_scan(carry, rows_per_cls, qp, lam_rd, crs_lut, fwd_lut, refs,
                  rox, roy, plt_planes, *, classes, frame_w, frame_h, bd,
                  encode, mts, lfnst, cclm, rdoq, mip, tskip, jccr, dq,
                  nf=1):
    """lax.scan over uniform steps; rows_per_cls: tuple of (n, K_c, 17)
    tensors aligned with ``classes`` (no nop entry)."""
    qp32 = jnp.asarray(qp, jnp.int32)
    lam32 = jnp.asarray(lam_rd, jnp.int32)

    def apply_cls(c, cls, r):
        kind, w, h, d = cls
        if kind == "intra":
            return _intra_batch.__wrapped__(
                c, r, qp32, lam32, crs_lut, s=w, frame_w=frame_w,
                frame_h=frame_h, bd=bd, encode=encode, mts=mts,
                lfnst=lfnst, cclm=cclm, rdoq=rdoq, mip=mip, tskip=tskip,
                jccr=jccr, dq=dq, nf=nf)
        if kind == "isp":
            return _isp_batch.__wrapped__(
                c, r, qp32, lam32, crs_lut, s=w, d=d, frame_w=frame_w,
                frame_h=frame_h, bd=bd, encode=encode, cclm=cclm,
                rdoq=rdoq, jccr=jccr, dq=dq, nf=nf)
        if kind == "rect":
            return _rect_batch.__wrapped__(
                c, r, qp32, lam32, crs_lut, w=w, h=h, frame_w=frame_w,
                frame_h=frame_h, bd=bd, encode=encode, rdoq=rdoq, dq=dq,
                nf=nf)
        if kind == "ibc":
            return _ibc_batch.__wrapped__(
                c, r, qp32, lam32, s=w, frame_w=frame_w, frame_h=frame_h,
                bd=bd, encode=encode, rdoq=rdoq, dq=dq, nf=nf)
        if kind == "plt":
            return _plt_batch.__wrapped__(
                c, r, plt_planes[0], plt_planes[1], plt_planes[2], s=w,
                nf=nf, frame_h=frame_h)
        if kind == "ciip":
            return _ciip_batch.__wrapped__(
                c, r, refs, qp32, lam32, fwd_lut, crs_lut, rox, roy, s=w,
                frame_w=frame_w, frame_h=frame_h, bd=bd, encode=encode,
                rdoq=rdoq, dq=dq, nf=nf)
        raise AssertionError(kind)    # pragma: no cover

    def step(c, xs):
        for cls, r in zip(classes, xs):
            c = apply_cls(c, cls, r)
        return c, None

    carry, _ = jax.lax.scan(step, carry, rows_per_cls)
    return carry
