"""JAX frame reconstruction scan — the conformance-path engine.

One ``lax.scan`` over coding-order slots (pipeline/plan.py); each step
dispatches via ``lax.switch`` on the leaf class — sizes {8,16,32} x
{intra, inter} — and runs the shared predict/MC -> (quantise) -> reconstruct
chain with static shapes, updating the margin-padded recon buffers and the
level planes in place.  The same compiled body serves the encoder (levels
computed from source) and the decoder (levels supplied from the parsed
bitstream) — the encoder-embeds-the-decoder property (SURVEY.md §1) realised
as one jitted function.

Role of VTM:EncoderLib/EncSlice::compressSlice + DecoderLib/DecCu (the CTU
reconstruction loops), restructured as a static scan for XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom
from ..kernels import intra_pred, mc, transform
from ..spec.codec import FrameDecisions
from ..spec.inter import BCW_DEFAULT, REF_MARGIN
from . import plan as planmod

MARGIN = intra_pred.MARGIN


def _component(buf, levels_io, src, pred, x, y, s, qp, bd, encode,
               rdoq=False, lam_rd=0, crs_sc=None, dq=False):
    """Shared residual+recon for one component block with given prediction.

    crs_sc (traced 1.11-fp scale): LMCS chroma residual scaling — forward
    divide before the transform, inverse multiply after (twin of spec
    lmcs.crs_fwd/crs_inv)."""
    if encode:
        blk = jax.lax.dynamic_slice(src, (y, x), (s, s)).astype(jnp.int32)
        resi = blk - pred
        if crs_sc is not None:
            resi = (resi << 11) // crs_sc
        coef = transform.forward_transform(resi, s, s, bd=bd)
        lev = transform.quantize(coef, s, s, qp, intra=True, bd=bd,
                                 rdoq=rdoq, lam_rd=lam_rd, dq=dq)
        levels_io = jax.lax.dynamic_update_slice(levels_io, lev, (y, x))
    else:
        lev = jax.lax.dynamic_slice(src, (y, x), (s, s))  # parsed levels
    if crs_sc is not None:
        r = transform.inverse_transform(
            transform.dequantize(lev, s, s, qp, bd, dq=dq), s, s, bd=bd)
        rec = jnp.clip(pred + ((r * crs_sc) >> 11), 0, (1 << bd) - 1)
    else:
        rec = transform.reconstruct(pred, lev, s, s, qp, bd=bd, dq=dq)
    buf = jax.lax.dynamic_update_slice(buf, rec, (y + 1, x + 1))
    return buf, levels_io


def chroma_rd_j(bcbk, bcrk, pred_opts, sc, cs: int, qp, bd: int,
                rdoq: bool, lam_rd, jccr: bool, dq: bool):
    """Unified (DM vs CCLM) x (separate vs JCCR) chroma RD — twin of the
    spec _code_leaf chroma loop, candidate-BATCHED: all forward/inverse
    transform + quant chains run as one stacked pass (op count O(1) in the
    candidate count).  Candidate order and first-min tie-breaking match
    the sequential strict-less loop exactly.

    Returns (lev_cb, lev_cr, rec_cb, rec_cr, use_c, use_j)."""
    mx = (1 << bd) - 1

    def inv_sc(r):
        return r if sc is None else (r * sc) >> 11

    P = len(pred_opts)
    rcb_l, rcr_l, rj_l = [], [], []
    for (pcb, pcr) in pred_opts:
        rcbr = bcbk - pcb
        rcrr = bcrk - pcr
        if sc is not None:
            rcbr = (rcbr << 11) // sc
            rcrr = (rcrr << 11) // sc
        rcb_l.append(rcbr)
        rcr_l.append(rcrr)
        if jccr:
            rj_l.append((rcbr - rcrr) >> 1)
    stack = jnp.stack(rcb_l + rcr_l + rj_l)
    coef = transform.forward_transform(stack, cs, cs, bd=bd)
    lev = transform.quantize(coef, cs, cs, qp, intra=True, bd=bd,
                             rdoq=rdoq, lam_rd=lam_rd, dq=dq)
    rr = transform.inverse_transform(
        transform.dequantize(lev, cs, cs, qp, bd, dq=dq), cs, cs, bd=bd)
    from ..cabac import estimate as _est
    _, _, _, _lvl_w = _est.tx_tables_j(qp)
    rate_fp = jnp.minimum(
        transform.level_rate_fp_j(lev, _lvl_w, axes=(-2, -1)), 1 << 22)
    rate_w = rate_fp >> 8
    rate_f = rate_fp & 255
    zero = jnp.zeros((cs, cs), jnp.int32)
    cands = []
    for ci, (pcb, pcr) in enumerate(pred_opts):
        rcbr, rcrr = rcb_l[ci], rcr_l[ci]
        db = jnp.minimum(jnp.abs(rcbr - rr[ci]), 2047)
        dr = jnp.minimum(jnp.abs(rcrr - rr[P + ci]), 2047)
        cost = ((db * db).sum() + (dr * dr).sum()
                + lam_rd * rate_w[ci] + ((lam_rd * rate_f[ci]) >> 8)
                + lam_rd * rate_w[P + ci]
                + ((lam_rd * rate_f[P + ci]) >> 8))
        cands.append((cost, lev[ci], lev[P + ci],
                      jnp.clip(pcb + inv_sc(rr[ci]), 0, mx),
                      jnp.clip(pcr + inv_sc(rr[P + ci]), 0, mx),
                      jnp.int32(ci), jnp.int32(0)))
        if jccr:
            rrj = rr[2 * P + ci]
            db = jnp.minimum(jnp.abs(rcbr - rrj), 2047)
            dr = jnp.minimum(jnp.abs(rcrr + rrj), 2047)
            cost = ((db * db).sum() + (dr * dr).sum()
                    + lam_rd * rate_w[2 * P + ci]
                    + ((lam_rd * rate_f[2 * P + ci]) >> 8))
            cands.append((cost, lev[2 * P + ci], zero,
                          jnp.clip(pcb + inv_sc(rrj), 0, mx),
                          jnp.clip(pcr - inv_sc(rrj), 0, mx),
                          jnp.int32(ci), jnp.int32(1)))
    i = jnp.argmin(jnp.stack([c[0] for c in cands])).astype(jnp.int32)
    out = tuple(jnp.stack([c[k] for c in cands])[i] for k in range(1, 7))
    return out


def _make_leaf_fn(s: int, inter: bool, *, frame_w: int, frame_h: int,
                  n_ctu_x: int, qp, bd: int, encode: bool, refs,
                  mts: bool = False, lfnst: bool = False, cclm: bool = False,
                  rdoq: bool = False, lam_rd=None, mip: bool = False,
                  tskip: bool = False, jccr: bool = False,
                  isp: bool = False, dq: bool = False, crs_lut=None):
    cs = s // 2
    num_reg = rom.NUM_LUMA_MODE

    def leaf(carry, x, y, mode, mvx, mvy, mts_in, lfnst_in, cmode_in,
             mrl_in, jccr_in, m1x, m1y, dd, wdx, isp_in):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
         cmodep, jccrp, sbtp) = carry
        if inter:
            pred_y = mc.mc_luma_block(refs[0], x, y, s, mvx, mvy, bd)
            pred_cb = mc.mc_chroma_block(refs[1], x // 2, y // 2, cs,
                                         mvx, mvy, bd)
            pred_cr = mc.mc_chroma_block(refs[2], x // 2, y // 2, cs,
                                         mvx, mvy, bd)
        else:
            top, left = intra_pred.build_references(
                by, x, y, s=s, is_luma=True, frame_w=frame_w,
                frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd, ref_line=mrl_in)
            mode_reg = jnp.minimum(mode, num_reg - 1)
            pred_y = intra_pred.predict(top, left, mode_reg, s=s,
                                        is_luma=True, bd=bd,
                                        ref_line=mrl_in)
            if mip:
                pred_y = jnp.where(
                    mode >= num_reg,
                    intra_pred.mip_predict_j(top, left, mode - num_reg,
                                             s=s, bd=bd),
                    pred_y)
                mode_dm = jnp.where(mode >= num_reg,
                                    jnp.int32(rom.PLANAR_IDX), mode)
            else:
                mode_dm = mode
            tcb, lcb_r = intra_pred.build_references(
                bcb, x // 2, y // 2, s=cs, is_luma=False,
                frame_w=frame_w // 2, frame_h=frame_h // 2,
                n_ctu_x=n_ctu_x, bd=bd)
            pred_cb = intra_pred.predict(tcb, lcb_r, mode_dm, s=cs,
                                         is_luma=False, bd=bd)
            tcr, lcr_r = intra_pred.build_references(
                bcr, x // 2, y // 2, s=cs, is_luma=False,
                frame_w=frame_w // 2, frame_h=frame_h // 2,
                n_ctu_x=n_ctu_x, bd=bd)
            pred_cr = intra_pred.predict(tcr, lcr_r, mode_dm, s=cs,
                                         is_luma=False, bd=bd)
        def luma_regular(by, ly):
            if (mts or lfnst or tskip) and not inter:
                # intra luma: RD-select the transform tools (device twin of
                # spec choose_tx), signalised via the mts/lfnst planes
                if encode:
                    blk = jax.lax.dynamic_slice(sy, (y, x),
                                                (s, s)).astype(jnp.int32)
                    midx, lidx, lev, rres = transform.choose_tx_j(
                        blk - pred_y, s, qp, lam_rd,
                        jnp.minimum(mode, num_reg - 1), bd, mts=mts,
                        lfnst=lfnst, rdoq=rdoq, dq=dq,
                        allow=(mode < num_reg) if mip else None, ts=tskip)
                    ly = jax.lax.dynamic_update_slice(ly, lev, (y, x))
                else:
                    midx = mts_in
                    lidx = lfnst_in
                    lev = jax.lax.dynamic_slice(sy, (y, x), (s, s))
                    dqc = transform.dequantize(lev, s, s, qp, bd, dq=dq)
                    if lfnst:
                        dqc = transform.inv_lfnst_switch_j(
                            dqc, lidx, jnp.minimum(mode, num_reg - 1))
                    branches_m = [
                        (lambda kh=kh, kv=kv: transform.inverse_transform(
                            dqc, s, s, kh, kv, bd))
                        for kh, kv in transform.MTS_SET]
                    rres = jax.lax.switch(midx, branches_m)
                rec = jnp.clip(pred_y + rres, 0, (1 << bd) - 1)
                by = jax.lax.dynamic_update_slice(by, rec, (y + 1, x + 1))
                return by, ly, midx, lidx
            by2, ly2 = _component(by, ly, sy, pred_y, x, y, s, qp, bd,
                                  encode, rdoq, lam_rd, dq=dq)
            return by2, ly2, jnp.int32(0), jnp.int32(0)

        if isp and not inter:
            from ..spec.codec import isp_kernels, isp_parts
            mode_reg2 = jnp.minimum(mode, num_reg - 1)

            def luma_isp(d):
                def f(by, ly):
                    # stripes sequential: each predicts from the recon
                    # buffer updated by the previous stripe (in-leaf
                    # availability via the leaf rect override)
                    for (dx2, dy2, w_st, h_st) in isp_parts(s, d):
                        px, py = x + dx2, y + dy2
                        tk, lk = intra_pred.build_references_rect(
                            by, px, py, w=w_st, h=h_st, is_luma=True,
                            frame_w=frame_w, frame_h=frame_h,
                            n_ctu_x=n_ctu_x, bd=bd, leaf_x=x, leaf_y=y,
                            leaf_w=s, leaf_h=s)
                        pred = intra_pred.predict_rect(
                            tk, lk, mode_reg2, w=w_st, h=h_st,
                            is_luma=True, bd=bd)
                        kh, kv = isp_kernels(w_st, h_st)
                        if encode:
                            blk = jax.lax.dynamic_slice(
                                sy, (py, px), (h_st, w_st)).astype(jnp.int32)
                            coef = transform.forward_transform(
                                blk - pred, h_st, w_st, kh, kv, bd)
                            lev = transform.quantize(
                                coef, h_st, w_st, qp, intra=True, bd=bd,
                                rdoq=rdoq, lam_rd=lam_rd, dq=dq)
                            ly = jax.lax.dynamic_update_slice(ly, lev,
                                                              (py, px))
                        else:
                            lev = jax.lax.dynamic_slice(sy, (py, px),
                                                        (h_st, w_st))
                        rec = transform.reconstruct(pred, lev, h_st, w_st,
                                                    qp, kh, kv, bd, dq=dq)
                        by = jax.lax.dynamic_update_slice(by, rec,
                                                          (py + 1, px + 1))
                    return by, ly, jnp.int32(0), jnp.int32(0)
                return f

            by, ly, midx_o, lidx_o = jax.lax.switch(
                jnp.clip(isp_in, 0, 2),
                [luma_regular, luma_isp(1), luma_isp(2)], by, ly)
        else:
            by, ly, midx_o, lidx_o = luma_regular(by, ly)
        if (mts or lfnst or tskip) and not inter:
            mtsp = jax.lax.dynamic_update_slice(
                mtsp, midx_o.reshape(1, 1), (y // 8, x // 8))
            lfnstp = jax.lax.dynamic_update_slice(
                lfnstp, lidx_o.reshape(1, 1), (y // 8, x // 8))
        sc = None
        if crs_lut is not None and not inter:
            lr = jax.lax.dynamic_slice(by, (y + 1, x + 1), (s, s))
            sc = crs_lut[lr.sum() >> _CRS_SHIFT[s]]
        if (cclm or jccr) and not inter:
            # unified (DM vs CCLM) x (separate vs JCCR) chroma decision —
            # twin of spec _code_leaf; candidate order and strict-less
            # first-min match the spec loop exactly
            cx2, cy2 = x // 2, y // 2
            mx = (1 << bd) - 1
            pred_opts = [(pred_cb, pred_cr)]
            if cclm:
                pred_opts.append((
                    intra_pred.cclm_predict_j(
                        by, bcb, cx2, cy2, cs=cs, frame_w=frame_w,
                        frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd),
                    intra_pred.cclm_predict_j(
                        by, bcr, cx2, cy2, cs=cs, frame_w=frame_w,
                        frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd)))
            if encode:
                bcbk = jax.lax.dynamic_slice(scb, (cy2, cx2),
                                             (cs, cs)).astype(jnp.int32)
                bcrk = jax.lax.dynamic_slice(scr, (cy2, cx2),
                                             (cs, cs)).astype(jnp.int32)

                (lev_cb, lev_cr, rcbb, rcrb, use_c, use_j) = chroma_rd_j(
                    bcbk, bcrk, pred_opts, sc, cs, qp, bd, rdoq, lam_rd,
                    jccr, dq)
                lcb = jax.lax.dynamic_update_slice(lcb, lev_cb, (cy2, cx2))
                lcr = jax.lax.dynamic_update_slice(lcr, lev_cr, (cy2, cx2))
                cmodep = jax.lax.dynamic_update_slice(
                    cmodep, use_c.reshape(1, 1), (y // 8, x // 8))
                jccrp = jax.lax.dynamic_update_slice(
                    jccrp, use_j.reshape(1, 1), (y // 8, x // 8))
            else:
                if cclm:
                    use = cmode_in > 0
                    pcb = jnp.where(use, pred_opts[1][0], pred_opts[0][0])
                    pcr = jnp.where(use, pred_opts[1][1], pred_opts[0][1])
                else:
                    pcb, pcr = pred_opts[0]
                lev_cb = jax.lax.dynamic_slice(scb, (cy2, cx2), (cs, cs))
                lev_cr = jax.lax.dynamic_slice(scr, (cy2, cx2), (cs, cs))
                rrj = transform.inverse_transform(
                    transform.dequantize(lev_cb, cs, cs, qp, bd, dq=dq),
                    cs, cs, bd=bd)
                if sc is not None:
                    rrj = (rrj * sc) >> 11
                    rrr2 = transform.inverse_transform(
                        transform.dequantize(lev_cr, cs, cs, qp, bd,
                                             dq=dq), cs, cs, bd=bd)
                    rcr_sep = jnp.clip(pcr + ((rrr2 * sc) >> 11), 0, mx)
                else:
                    rcr_sep = transform.reconstruct(pcr, lev_cr, cs, cs,
                                                    qp, bd=bd, dq=dq)
                rcbb = jnp.clip(pcb + rrj, 0, mx)
                if jccr:
                    rcrb = jnp.where(jccr_in > 0,
                                     jnp.clip(pcr - rrj, 0, mx), rcr_sep)
                else:
                    rcrb = rcr_sep
            bcb = jax.lax.dynamic_update_slice(bcb, rcbb,
                                               (cy2 + 1, cx2 + 1))
            bcr = jax.lax.dynamic_update_slice(bcr, rcrb,
                                               (cy2 + 1, cx2 + 1))
        else:
            bcb, lcb = _component(bcb, lcb, scb, pred_cb, x // 2, y // 2,
                                  cs, qp, bd, encode, rdoq, lam_rd, dq=dq,
                                  crs_sc=None if inter else sc)
            bcr, lcr = _component(bcr, lcr, scr, pred_cr, x // 2, y // 2,
                                  cs, qp, bd, encode, rdoq, lam_rd, dq=dq,
                                  crs_sc=None if inter else sc)
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
                cmodep, jccrp, sbtp)

    return leaf


def _make_ciip_fn(s: int, *, frame_w: int, frame_h: int, n_ctu_x: int, qp,
                  bd: int, encode: bool, refs, rdoq: bool = False,
                  lam_rd=None, fwd_lut=None, crs_lut=None, dq: bool = False,
                  rox=0, roy=0, **_unused):
    """CIIP leaf: sequential phase-B reconstruction (intra dependency) —
    MC (BCW-weighted average for BI) blended equally with planar intra from
    the reconstructed neighbours; twin of spec _ciip_blend + _inter_pred's
    ciip branch."""
    from ..spec.inter import BCW_W
    cs = s // 2
    mx = (1 << bd) - 1
    bcw_w = jnp.asarray(np.asarray(BCW_W, np.int32))

    def leaf(carry, x, y, mode, mvx, mvy, mts_in, lfnst_in, cmode_in,
             mrl_in, jccr_in, m1x, m1y, dd, wdx, isp_in):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
         cmodep, jccrp, sbtp) = carry
        w = bcw_w[jnp.clip(wdx, 0, 2)]

        def mcpred(r0, r1, px, py, sz, luma):
            f = mc.mc_luma_block if luma else mc.mc_chroma_block
            ox = rox if luma else rox // 2
            oy = roy if luma else roy // 2
            p0 = f(r0, px + ox, py + oy, sz, mvx, mvy, bd)
            p1 = f(r1, px + ox, py + oy, sz, m1x, m1y, bd)
            avg = jnp.clip((w * p0 + (8 - w) * p1 + 4) >> 3, 0, mx)
            return jnp.where(dd == 0, p0, jnp.where(dd == 1, p1, avg))

        def blend(mc_p, buf, px, py, sz, luma):
            top, left = intra_pred.build_references(
                buf, px, py, s=sz, is_luma=luma,
                frame_w=frame_w if luma else frame_w // 2,
                frame_h=frame_h if luma else frame_h // 2,
                n_ctu_x=n_ctu_x, bd=bd)
            pl = intra_pred.predict(top, left, jnp.int32(rom.PLANAR_IDX),
                                    s=sz, is_luma=luma, bd=bd)
            return jnp.clip((mc_p + pl + 1) >> 1, 0, mx)

        pred_y = mcpred(refs[0], refs[3], x, y, s, True)
        if fwd_lut is not None:
            pred_y = jnp.take(fwd_lut, pred_y)
        pred_y = blend(pred_y, by, x, y, s, True)
        pred_cb = blend(mcpred(refs[1], refs[4], x // 2, y // 2, cs, False),
                        bcb, x // 2, y // 2, cs, False)
        pred_cr = blend(mcpred(refs[2], refs[5], x // 2, y // 2, cs, False),
                        bcr, x // 2, y // 2, cs, False)
        by, ly = _component(by, ly, sy, pred_y, x, y, s, qp, bd, encode,
                            rdoq, lam_rd, dq=dq)
        sc = None
        if crs_lut is not None:
            lr = jax.lax.dynamic_slice(by, (y + 1, x + 1), (s, s))
            sc = crs_lut[lr.sum() >> _CRS_SHIFT[s]]
        bcb, lcb = _component(bcb, lcb, scb, pred_cb, x // 2, y // 2, cs,
                              qp, bd, encode, rdoq, lam_rd, crs_sc=sc,
                              dq=dq)
        bcr, lcr = _component(bcr, lcr, scr, pred_cr, x // 2, y // 2, cs,
                              qp, bd, encode, rdoq, lam_rd, crs_sc=sc,
                              dq=dq)
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
                cmodep, jccrp, sbtp)

    return leaf


_CRS_SHIFT = {8: 6, 16: 8, 32: 10}   # 2 * log2(s)


def _log2i(n: int) -> int:
    return int(n).bit_length() - 1


def _component_rect(buf, levels_io, src, pred, x, y, w: int, h: int, qp,
                    bd, encode, rdoq=False, lam_rd=0, dq=False,
                    crs_sc=None):
    """Rect twin of _component (BT leaves)."""
    if encode:
        blk = jax.lax.dynamic_slice(src, (y, x), (h, w)).astype(jnp.int32)
        resi = blk - pred
        if crs_sc is not None:
            resi = (resi << 11) // crs_sc
        coef = transform.forward_transform(resi, h, w, bd=bd)
        lev = transform.quantize(coef, h, w, qp, intra=True, bd=bd,
                                 rdoq=rdoq, lam_rd=lam_rd, dq=dq)
        levels_io = jax.lax.dynamic_update_slice(levels_io, lev, (y, x))
    else:
        lev = jax.lax.dynamic_slice(src, (y, x), (h, w))
    if crs_sc is not None:
        r = transform.inverse_transform(
            transform.dequantize(lev, h, w, qp, bd, dq=dq), h, w, bd=bd)
        rec = jnp.clip(pred + ((r * crs_sc) >> 11), 0, (1 << bd) - 1)
    else:
        rec = transform.reconstruct(pred, lev, h, w, qp, bd=bd, dq=dq)
    buf = jax.lax.dynamic_update_slice(buf, rec, (y + 1, x + 1))
    return buf, levels_io


def _make_rect_leaf_fn(w: int, h: int, *, frame_w: int, frame_h: int,
                       n_ctu_x: int, qp, bd: int, encode: bool, refs,
                       rdoq: bool = False, lam_rd=None, dq: bool = False,
                       crs_lut=None, **_unused):
    """Rectangular (BT) intra leaf: plain 67-mode prediction + DM chroma
    (square-only tools are gated off on rect leaves — twin of the spec
    _code_leaf rect path)."""
    cw, ch = w // 2, h // 2
    ps = max(w, h)          # enclosing square (BT parent) size

    def leaf(carry, x, y, mode, mvx, mvy, mts_in, lfnst_in, cmode_in,
             mrl_in, jccr_in, m1x, m1y, dd, wdx, isp_in):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
         cmodep, jccrp, sbtp) = carry
        # availability: the sibling BT child precedes this one in coding
        # order but shares the parent's granule Morton index, so the
        # parent rect is passed as the already-coded override (same rule
        # as ISP stripes)
        px0 = x & ~(ps - 1)
        py0 = y & ~(ps - 1)
        top, left = intra_pred.build_references_rect(
            by, x, y, w=w, h=h, is_luma=True, frame_w=frame_w,
            frame_h=frame_h, n_ctu_x=n_ctu_x, bd=bd,
            leaf_x=px0, leaf_y=py0, leaf_w=ps, leaf_h=ps)
        pred_y = intra_pred.predict_rect(top, left, mode, w=w, h=h,
                                         is_luma=True, bd=bd)
        by, ly = _component_rect(by, ly, sy, pred_y, x, y, w, h, qp, bd,
                                 encode, rdoq, lam_rd, dq)
        sc = None
        if crs_lut is not None:
            lr = jax.lax.dynamic_slice(by, (y + 1, x + 1), (h, w))
            sc = crs_lut[lr.sum() >> (_log2i(w) + _log2i(h))]
        tcb, lcb_r = intra_pred.build_references_rect(
            bcb, x // 2, y // 2, w=cw, h=ch, is_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            bd=bd, leaf_x=px0 // 2, leaf_y=py0 // 2, leaf_w=ps // 2,
            leaf_h=ps // 2)
        pred_cb = intra_pred.predict_rect(tcb, lcb_r, mode, w=cw, h=ch,
                                          is_luma=False, bd=bd)
        bcb, lcb = _component_rect(bcb, lcb, scb, pred_cb, x // 2, y // 2,
                                   cw, ch, qp, bd, encode, rdoq, lam_rd,
                                   dq, crs_sc=sc)
        tcr, lcr_r = intra_pred.build_references_rect(
            bcr, x // 2, y // 2, w=cw, h=ch, is_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            bd=bd, leaf_x=px0 // 2, leaf_y=py0 // 2, leaf_w=ps // 2,
            leaf_h=ps // 2)
        pred_cr = intra_pred.predict_rect(tcr, lcr_r, mode, w=cw, h=ch,
                                          is_luma=False, bd=bd)
        bcr, lcr = _component_rect(bcr, lcr, scr, pred_cr, x // 2, y // 2,
                                   cw, ch, qp, bd, encode, rdoq, lam_rd,
                                   dq, crs_sc=sc)
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
                cmodep, jccrp, sbtp)

    return leaf


def _make_ibc_fn(s: int, *, frame_w: int, frame_h: int, qp, bd: int,
                 encode: bool, rdoq: bool = False, lam_rd=None,
                 dq: bool = False, **_unused):
    """IBC leaf: copy-predict from the already-reconstructed area of the
    current picture at the (clamped) block vector — twin of spec
    _code_ibc_leaf.  Sequential phase-B (reads the recon buffers)."""
    cs = s // 2

    def leaf(carry, x, y, mode, bvx, bvy, mts_in, lfnst_in, cmode_in,
             mrl_in, jccr_in, m1x, m1y, dd, wdx, isp_in):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
         cmodep, jccrp, sbtp) = carry
        sx = jnp.clip(x + bvx, 0, frame_w - s)
        sy0 = jnp.clip(y + bvy, 0, frame_h - s)
        pred_y = jax.lax.dynamic_slice(by, (sy0 + 1, sx + 1), (s, s))
        pred_cb = jax.lax.dynamic_slice(
            bcb, (sy0 // 2 + 1, sx // 2 + 1), (cs, cs))
        pred_cr = jax.lax.dynamic_slice(
            bcr, (sy0 // 2 + 1, sx // 2 + 1), (cs, cs))
        by, ly = _component(by, ly, sy, pred_y, x, y, s, qp, bd, encode,
                            rdoq, lam_rd, dq=dq)
        bcb, lcb = _component(bcb, lcb, scb, pred_cb, x // 2, y // 2, cs,
                              qp, bd, encode, rdoq, lam_rd, dq=dq)
        bcr, lcr = _component(bcr, lcr, scr, pred_cr, x // 2, y // 2, cs,
                              qp, bd, encode, rdoq, lam_rd, dq=dq)
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
                cmodep, jccrp, sbtp)

    return leaf


def _make_plt_fn(s: int, *, frame_w: int, frame_h: int, plt_y, plt_cb,
                 plt_cr, **_unused):
    """Palette leaf: copy the precomputed palette-recon block (host-derived
    entries[idx] pixels, spec/palette.py) into the recon buffers; no
    residual (levels stay zero) — twin of spec _code_plt_leaf."""
    cs = s // 2

    def leaf(carry, x, y, mode, bvx, bvy, mts_in, lfnst_in, cmode_in,
             mrl_in, jccr_in, m1x, m1y, dd, wdx, isp_in):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
         cmodep, jccrp, sbtp) = carry
        blk = jax.lax.dynamic_slice(plt_y, (y, x), (s, s))
        by = jax.lax.dynamic_update_slice(by, blk, (y + 1, x + 1))
        bcb = jax.lax.dynamic_update_slice(
            bcb, jax.lax.dynamic_slice(plt_cb, (y // 2, x // 2), (cs, cs)),
            (y // 2 + 1, x // 2 + 1))
        bcr = jax.lax.dynamic_update_slice(
            bcr, jax.lax.dynamic_slice(plt_cr, (y // 2, x // 2), (cs, cs)),
            (y // 2 + 1, x // 2 + 1))
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
                cmodep, jccrp, sbtp)

    return leaf


def _slab_strides(frame_h: int):
    """(luma ref, chroma ref, luma plane, chroma plane, grid8) per-frame
    row strides of stacked batch buffers (frame-batched engine)."""
    return (frame_h + 2 * REF_MARGIN, frame_h // 2 + REF_MARGIN,
            frame_h, frame_h // 2, frame_h // 8)


def _inter_batch_pass_rect(carry, ib_slots, refs, w: int, h: int, qp,
                           bd: int, encode: bool, rdoq: bool = False,
                           lam_rd=0, fwd_lut=None, crs_lut=None,
                           dq: bool = False, rox=0, roy=0, nf: int = 1,
                           frame_h_s: int = 0):
    """Phase A for rectangular (BT) inter leaves: plain translational MC
    (uni/BI equal weight) — twin of the spec _inter_pred rect path.

    ib_slots: (B, 7) int32 [x, y, mv0x, mv0y, mv1x, mv1y, dir] (+ col 7 =
    frame index when nf > 1); invalid rows have x = y = 2^20."""
    (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
     cmodep, jccrp, sbtp) = carry
    cw, ch = w // 2, h // 2
    mx = (1 << bd) - 1
    crs_shift = _log2i(w) + _log2i(h)
    slr, slrc, spy, spc, sp8 = _slab_strides(frame_h_s)

    def one(slot):
        x, y = slot[0], slot[1]
        m0x, m0y, m1x, m1y, d = slot[2], slot[3], slot[4], slot[5], slot[6]
        fidx = slot[7] if nf > 1 else 0
        oR = fidx * slr
        oRc = fidx * slrc
        oP = fidx * spy
        oPc = fidx * spc

        def bipred(ref0, ref1, px, py, pw, ph, luma):
            f = mc.mc_luma_block if luma else mc.mc_chroma_block
            ox = rox if luma else rox // 2
            oy = (roy + oR) if luma else (roy // 2 + oRc)
            p0 = f(ref0, px + ox, py + oy, pw, m0x, m0y, bd, h=ph)
            p1 = f(ref1, px + ox, py + oy, pw, m1x, m1y, bd, h=ph)
            avg = jnp.minimum((p0 + p1 + 1) >> 1, mx)
            return jnp.where(d == 0, p0, jnp.where(d == 1, p1, avg))

        pred_y = bipred(refs[0], refs[3], x, y, w, h, True)
        pred_cb = bipred(refs[1], refs[4], x // 2, y // 2, cw, ch, False)
        pred_cr = bipred(refs[2], refs[5], x // 2, y // 2, cw, ch, False)
        if fwd_lut is not None:
            pred_y = jnp.take(fwd_lut, pred_y)

        def comp(src, pred, cx, cy, pw, ph, sc=None):
            if encode:
                blk = jax.lax.dynamic_slice(src, (cy, cx),
                                            (ph, pw)).astype(jnp.int32)
                resi = blk - pred
                if sc is not None:
                    resi = (resi << 11) // sc
                coef = transform.forward_transform(resi, ph, pw, bd=bd)
                lev = transform.quantize(coef, ph, pw, qp, intra=True,
                                         bd=bd, rdoq=rdoq, lam_rd=lam_rd,
                                         dq=dq)
            else:
                lev = jax.lax.dynamic_slice(src, (cy, cx), (ph, pw))
            if sc is not None:
                r = transform.inverse_transform(
                    transform.dequantize(lev, ph, pw, qp, bd, dq=dq), ph,
                    pw, bd=bd)
                rec = jnp.clip(pred + ((r * sc) >> 11), 0, mx)
            else:
                rec = transform.reconstruct(pred, lev, ph, pw, qp, bd=bd,
                                            dq=dq)
            return rec, lev

        ry, lvy = comp(sy, pred_y, x, oP + y, w, h)
        sc = None
        if crs_lut is not None:
            sc = crs_lut[ry.sum() >> crs_shift]
        rcb, lvcb = comp(scb, pred_cb, x // 2, oPc + y // 2, cw, ch, sc)
        rcr, lvcr = comp(scr, pred_cr, x // 2, oPc + y // 2, cw, ch, sc)
        return ry, rcb, rcr, lvy, lvcb, lvcr

    ry, rcb, rcr, lvy, lvcb, lvcr = jax.vmap(one)(ib_slots)

    def scatter(buf, blocks, xs0, ys0, pw, ph, off):
        yy = ys0[:, None, None] + off + jnp.arange(ph)[None, :, None]
        xx = xs0[:, None, None] + off + jnp.arange(pw)[None, None, :]
        return buf.at[yy, xx].set(blocks, mode="drop")

    xs, ys = ib_slots[:, 0], ib_slots[:, 1]
    if nf > 1:
        fv = ib_slots[:, 7]
        from ..pipeline.wave import _slabs as _wave_slabs
        sly, slc, _spy2, _spc2, _sp82 = _wave_slabs(frame_h_s)
        oLv, oCv, oPv, oPcv = fv * sly, fv * slc, fv * spy, fv * spc
    else:
        oLv = oCv = oPv = oPcv = 0
    by = scatter(by, ry, xs, oLv + ys, w, h, 1)
    bcb = scatter(bcb, rcb, xs // 2, oCv + ys // 2, cw, ch, 1)
    bcr = scatter(bcr, rcr, xs // 2, oCv + ys // 2, cw, ch, 1)
    if encode:
        ly = scatter(ly, lvy, xs, oPv + ys, w, h, 0)
        lcb = scatter(lcb, lvcb, xs // 2, oPcv + ys // 2, cw, ch, 0)
        lcr = scatter(lcr, lvcr, xs // 2, oPcv + ys // 2, cw, ch, 0)
    return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp, cmodep,
            jccrp, sbtp)


def _inter_batch_pass(carry, ib_slots, refs, s: int, qp, bd: int,
                      encode: bool, frame_w: int, frame_h: int,
                      rdoq: bool = False, lam_rd=0, fwd_lut=None,
                      dmvr: bool = False, bdof: bool = False,
                      sbt: bool = False, crs_lut=None, gpm: bool = False,
                      affine: bool = False, dq: bool = False, rox=0,
                      roy=0, nf: int = 1, frame_h_s: int = 0):
    """Phase A: all inter s-leaves at once (no intra-frame dependency).

    ib_slots: (B, 13) int32 [x, y, mv0x, mv0y, mv1x, mv1y, dir, bcw_idx,
    sbt_idx, gpm_idx, aff, admvx, admvy] (+ col 13 = frame index when
    nf > 1); invalid rows have x = y = 2^20 (positive out-of-bounds: their
    scatter indices are dropped).  refs: (l0_y, ..., l1_cr), frame-slab
    stacked in batch mode."""
    from ..spec.inter import BCW_DEFAULT, BCW_W
    (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp,
     cmodep, jccrp, sbtp) = carry
    cs = s // 2
    mx = (1 << bd) - 1
    bcw_w = jnp.asarray(np.asarray(BCW_W, np.int32))
    if gpm:
        # (65, s, s): index 0 unused (gpm off), 1..64 = partition masks
        gmask_np = np.concatenate([np.zeros((1, s, s), np.int32),
                                   rom.gpm_masks_all(s)])
        gmask = jnp.asarray(gmask_np)

    slr, slrc, spy, spc, sp8 = _slab_strides(frame_h_s)

    def one(slot):
        x, y = slot[0], slot[1]
        fidx = slot[13] if nf > 1 else 0
        oR = fidx * slr
        oRc = fidx * slrc
        oP = fidx * spy
        oPc = fidx * spc
        fx, fy = x + rox, y + roy + oR     # frame coords for MC gathers
        fyc = (y + roy) // 2 + oRc         # chroma-plane row coord
        m0x, m0y, m1x, m1y, d = slot[2], slot[3], slot[4], slot[5], slot[6]
        w = bcw_w[jnp.clip(slot[7], 0, 2)]
        eqw = slot[7] == BCW_DEFAULT
        gv = slot[9] if gpm else jnp.int32(0)
        if gpm:
            gw_l = gmask[jnp.clip(gv, 0, 64)]
            gw_c = gw_l[::2, ::2]

        def wavg(p0, p1):
            return jnp.clip((w * p0 + (8 - w) * p1 + 4) >> 3, 0, mx)

        def bi_blend(p0, p1, luma, oy: int = 0, ox: int = 0, sub=None):
            """BI combination: BCW weighted average, or the GPM mask blend
            for GPM leaves (sub-rect of the mask for DMVR subblocks)."""
            avg = wavg(p0, p1)
            if not gpm:
                return avg
            gwm = gw_l if luma else gw_c
            if sub is not None:
                gwm = gwm[oy:oy + sub, ox:ox + sub]
            gb = jnp.clip((gwm * p0 + (8 - gwm) * p1 + 4) >> 3, 0, mx)
            return jnp.where(gv > 0, gb, avg)

        def bipred(ref0, ref1, px, py, sz, luma):
            f = mc.mc_luma_block if luma else mc.mc_chroma_block
            ox = rox if luma else rox // 2
            oy = (roy + oR) if luma else (roy // 2 + oRc)
            p0 = f(ref0, px + ox, py + oy, sz, m0x, m0y, bd)
            p1 = f(ref1, px + ox, py + oy, sz, m1x, m1y, bd)
            return jnp.where(d == 0, p0,
                             jnp.where(d == 1, p1, bi_blend(p0, p1, luma)))

        if dmvr or bdof:
            # BI refinement path (twin of spec _inter_pred's DMVR/BDOF
            # branch): per-16x16 mirrored-SAD MV offset, per-4x4 optical
            # flow; offsets masked to zero for uni-predicted leaves.
            from ..spec.inter import DMVR_SUB, MV_FRAC_BITS
            sub = DMVR_SUB if (dmvr and s >= DMVR_SUB) else s
            pred_y = jnp.zeros((s, s), jnp.int32)
            pred_cb = jnp.zeros((cs, cs), jnp.int32)
            pred_cr = jnp.zeros((cs, cs), jnp.int32)
            for sy0 in range(0, s, sub):
                for sx0 in range(0, s, sub):
                    a0x, a0y, a1x, a1y = m0x, m0y, m1x, m1y
                    if dmvr and s >= DMVR_SUB:
                        odx, ody = mc.dmvr_offset_j(
                            refs[0], refs[3], fx + sx0, fy + sy0, sub,
                            m0x, m0y, m1x, m1y)
                        odx = jnp.where((d == 2) & eqw & (gv == 0), odx, 0)
                        ody = jnp.where((d == 2) & eqw & (gv == 0), ody, 0)
                        a0x = m0x + (odx << MV_FRAC_BITS)
                        a0y = m0y + (ody << MV_FRAC_BITS)
                        a1x = m1x - (odx << MV_FRAC_BITS)
                        a1y = m1y - (ody << MV_FRAC_BITS)
                    p0e = mc.mc_luma_block(refs[0], fx + sx0 - 1,
                                           fy + sy0 - 1, sub + 2, a0x, a0y,
                                           bd)
                    p1e = mc.mc_luma_block(refs[3], fx + sx0 - 1,
                                           fy + sy0 - 1, sub + 2, a1x, a1y,
                                           bd)
                    p0c = p0e[1:-1, 1:-1]
                    p1c = p1e[1:-1, 1:-1]
                    # unequal BCW weights and GPM leaves disable the BDOF
                    # blend (spec _inter_pred takes the mask-blend path)
                    fallback = bi_blend(p0c, p1c, True, sy0, sx0, sub)
                    if bdof:
                        bi = jnp.where(eqw & (gv == 0),
                                       mc.bdof_blend_j(p0e, p1e, bd),
                                       fallback)
                    else:
                        bi = fallback
                    blk = jnp.where(d == 0, p0c, jnp.where(d == 1, p1c, bi))
                    pred_y = jax.lax.dynamic_update_slice(pred_y, blk,
                                                          (sy0, sx0))
                    cs2 = sub // 2
                    for ci, (r0c, r1c) in enumerate(((refs[1], refs[4]),
                                                     (refs[2], refs[5]))):
                        c0 = mc.mc_chroma_block(r0c, (x + rox + sx0) // 2,
                                                fyc + sy0 // 2, cs2, a0x,
                                                a0y, bd)
                        c1 = mc.mc_chroma_block(r1c, (x + rox + sx0) // 2,
                                                fyc + sy0 // 2, cs2, a1x,
                                                a1y, bd)
                        cblk = jnp.where(
                            d == 0, c0,
                            jnp.where(d == 1, c1,
                                      bi_blend(c0, c1, False, sy0 // 2,
                                               sx0 // 2, cs2)))
                        if ci == 0:
                            pred_cb = jax.lax.dynamic_update_slice(
                                pred_cb, cblk, (sy0 // 2, sx0 // 2))
                        else:
                            pred_cr = jax.lax.dynamic_update_slice(
                                pred_cr, cblk, (sy0 // 2, sx0 // 2))
        else:
            pred_y = bipred(refs[0], refs[3], x, y, s, True)
            pred_cb = bipred(refs[1], refs[4], x // 2, y // 2, cs, False)
            pred_cr = bipred(refs[2], refs[5], x // 2, y // 2, cs, False)
        if affine and s >= 16:
            # affine override for uni leaves (twin of spec _inter_pred's
            # affine branch): per-subblock MC + PROF at the model MVs
            av, amx, amy = slot[10], slot[11], slot[12]
            bmx = jnp.where(d == 0, m0x, m1x)
            bmy = jnp.where(d == 0, m0y, m1y)

            def aff3(ry, rcb, rcr):
                ay = mc.affine_pred_luma_j(ry, fx, fy, s, bmx, bmy, amx,
                                           amy, bd)
                acb = mc.affine_pred_chroma_j(rcb, (x + rox) // 2, fyc, cs,
                                              bmx, bmy, amx, amy, s, bd)
                acr = mc.affine_pred_chroma_j(rcr, (x + rox) // 2, fyc, cs,
                                              bmx, bmy, amx, amy, s, bd)
                return ay, acb, acr

            a0 = aff3(refs[0], refs[1], refs[2])
            a1 = aff3(refs[3], refs[4], refs[5])
            sel0 = d == 0
            pred_y = jnp.where(av > 0, jnp.where(sel0, a0[0], a1[0]),
                               pred_y)
            pred_cb = jnp.where(av > 0, jnp.where(sel0, a0[1], a1[1]),
                                pred_cb)
            pred_cr = jnp.where(av > 0, jnp.where(sel0, a0[2], a1[2]),
                                pred_cr)
        if fwd_lut is not None:
            # LMCS: the final luma prediction is forward-mapped (intra and
            # residual coding run in the mapped domain)
            pred_y = jnp.take(fwd_lut, pred_y)

        def comp(src, pred, cx, cy, sz, sc=None):
            if encode:
                blk = jax.lax.dynamic_slice(src, (cy, cx),
                                            (sz, sz)).astype(jnp.int32)
                resi = blk - pred
                if sc is not None:
                    resi = (resi << 11) // sc
                coef = transform.forward_transform(resi, sz, sz, bd=bd)
                lev = transform.quantize(coef, sz, sz, qp, intra=True, bd=bd,
                                         rdoq=rdoq, lam_rd=lam_rd, dq=dq)
            else:
                lev = jax.lax.dynamic_slice(src, (cy, cx), (sz, sz))
            if sc is not None:
                r = transform.inverse_transform(
                    transform.dequantize(lev, sz, sz, qp, bd, dq=dq), sz,
                    sz, bd=bd)
                rec = jnp.clip(pred + ((r * sc) >> 11), 0, mx)
            else:
                rec = transform.reconstruct(pred, lev, sz, sz, qp, bd=bd,
                                            dq=dq)
            return rec, lev

        if sbt:
            # SBT RD / reconstruct on the luma TB (twin of spec
            # _prep_inter_enc's choose_sbt + _code_component's SBT path)
            if encode:
                blk = jax.lax.dynamic_slice(sy, (oP + y, x),
                                            (s, s)).astype(jnp.int32)
                sidx, lvy, rres = transform.choose_sbt_j(
                    blk - pred_y, s, qp, lam_rd, bd=bd, rdoq=rdoq, dq=dq)
            else:
                sidx = slot[8]
                lvy = jax.lax.dynamic_slice(sy, (oP + y, x), (s, s))
                rres = transform.sbt_resi_j(lvy, sidx, s, qp, bd, dq=dq)
            ry = jnp.clip(pred_y + rres, 0, mx)
        else:
            sidx = jnp.int32(0)
            ry, lvy = comp(sy, pred_y, x, oP + y, s)
        sc = None
        if crs_lut is not None:
            # CRS: slope at the leaf's avg reconstructed mapped luma
            sc = crs_lut[ry.sum() >> _CRS_SHIFT[s]]
        rcb, lvcb = comp(scb, pred_cb, x // 2, oPc + y // 2, cs, sc)
        rcr, lvcr = comp(scr, pred_cr, x // 2, oPc + y // 2, cs, sc)
        return ry, rcb, rcr, lvy, lvcb, lvcr, sidx

    ry, rcb, rcr, lvy, lvcb, lvcr, sidxs = jax.vmap(one)(ib_slots)

    def scatter(buf, blocks, xs0, ys0, sz, off):
        b = blocks.shape[0]
        yy = ys0[:, None, None] + off + jnp.arange(sz)[None, :, None]
        xx = xs0[:, None, None] + off + jnp.arange(sz)[None, None, :]
        return buf.at[yy, xx].set(blocks, mode="drop")

    xs, ys = ib_slots[:, 0], ib_slots[:, 1]
    if nf > 1:
        fv = ib_slots[:, 13]
        from ..pipeline.wave import _slabs as _wave_slabs
        sly, slc, _s1, _s2, _s3 = _wave_slabs(frame_h_s)
        oLv, oCv, oPv, oPcv, o8v = (fv * sly, fv * slc, fv * spy,
                                    fv * spc, fv * sp8)
    else:
        oLv = oCv = oPv = oPcv = o8v = 0
    by = scatter(by, ry, xs, oLv + ys, s, 1)
    bcb = scatter(bcb, rcb, xs // 2, oCv + ys // 2, cs, 1)
    bcr = scatter(bcr, rcr, xs // 2, oCv + ys // 2, cs, 1)
    if encode:
        ly = scatter(ly, lvy, xs, oPv + ys, s, 0)
        lcb = scatter(lcb, lvcb, xs // 2, oPcv + ys // 2, cs, 0)
        lcr = scatter(lcr, lvcr, xs // 2, oPcv + ys // 2, cs, 0)
        if sbt:
            sbtp = sbtp.at[o8v + ys // 8, xs // 8].set(sidxs, mode="drop")
    return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr, mtsp, lfnstp, cmodep,
            jccrp, sbtp)


@functools.partial(jax.jit,
                   static_argnames=("frame_w", "frame_h", "bd", "encode",
                                    "inter_enabled", "mts", "lfnst",
                                    "cclm", "rdoq", "lmcs", "mip",
                                    "tskip", "jccr", "dmvr", "bdof",
                                    "ciip", "sbt", "isp", "gpm",
                                    "affine", "dq", "mtt", "ibc"))
def frame_scan(slots, planes_y, planes_cb, planes_cr, *, frame_w: int,
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
    """Run the full-frame reconstruction scan.

    slots: (N, 6) int32 [op, x, y, mode, mvx, mvy] in coding order; op 0 =
    skip, 1/2/3 intra 8/16/32, 4/5/6 CIIP inter 8/16/32 (sequential
    phase-B leaves; plain inter leaves run in the phase-A batch).
    planes_*: encode -> source planes; decode -> parsed level planes.
    ref_*: margin-padded reference planes (P slices).
    Returns (recon_y, recon_cb, recon_cr, levels_y, levels_cb, levels_cr).
    """
    n_ctu_x = frame_w >> intra_pred.LOG2_CTU
    h2, w2 = frame_h // 2, frame_w // 2

    def mkbuf(h, w):
        return jnp.zeros((h + 1 + MARGIN, w + 1 + MARGIN), jnp.int32)

    carry = (mkbuf(frame_h, frame_w), mkbuf(h2, w2), mkbuf(h2, w2),
             jnp.zeros((frame_h, frame_w), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             planes_y.astype(jnp.int32), planes_cb.astype(jnp.int32),
             planes_cr.astype(jnp.int32),
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
        # phase A: every inter leaf at once (no intra-frame dependency)
        for s_sz, ib in ((8, inter8), (16, inter16), (32, inter32)):
            carry = _inter_batch_pass(carry, ib, refs, s_sz, qp, bd, encode,
                                      frame_w, frame_h, rdoq,
                                      jnp.asarray(lam_rd, jnp.int32),
                                      fwd_lut if lmcs else None,
                                      dmvr=dmvr, bdof=bdof, sbt=sbt,
                                      crs_lut=crs_lut if lmcs else None,
                                      gpm=gpm, affine=affine, dq=dq,
                                      rox=rox, roy=roy)
        if mtt:
            for (rw, rh), ib in (((16, 8), rect16x8), ((8, 16), rect8x16),
                                 ((32, 16), rect32x16),
                                 ((16, 32), rect16x32),
                                 ((32, 8), rect32x8), ((8, 32), rect8x32)):
                if ib is None:
                    continue
                carry = _inter_batch_pass_rect(
                    carry, ib, refs, rw, rh, qp, bd, encode, rdoq,
                    jnp.asarray(lam_rd, jnp.int32),
                    fwd_lut if lmcs else None,
                    crs_lut=crs_lut if lmcs else None, dq=dq,
                    rox=rox, roy=roy)

    # phase B: intra leaves in coding order (inter slots are op=0 skips)
    kw = dict(frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x, qp=qp,
              bd=bd, encode=encode, refs=refs, mts=mts, lfnst=lfnst,
              cclm=cclm, rdoq=rdoq, lam_rd=jnp.asarray(lam_rd, jnp.int32),
              mip=mip, tskip=tskip, jccr=jccr, isp=isp, dq=dq,
              crs_lut=crs_lut if lmcs else None)
    branches = [lambda c, *a: c,
                _make_leaf_fn(8, False, **kw), _make_leaf_fn(16, False, **kw),
                _make_leaf_fn(32, False, **kw)]
    # canonical op -> branch index (ops: 0 skip, 1-3 intra sq, 4-6 inter sq
    # [phase A], 7-9 CIIP, 10-15 rect intra, 16-21 rect inter [phase A],
    # 22-24 IBC) — see pipeline/plan.py
    op2b = np.zeros(planmod.OP_MAX + 1, np.int32)
    op2b[1:4] = (1, 2, 3)
    if ciip and inter_enabled:
        ckw = dict(frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x, qp=qp,
                   bd=bd, encode=encode, refs=refs, rdoq=rdoq,
                   lam_rd=jnp.asarray(lam_rd, jnp.int32),
                   fwd_lut=fwd_lut if lmcs else None,
                   crs_lut=crs_lut if lmcs else None, dq=dq,
                   rox=rox, roy=roy)
        op2b[7:10] = np.arange(len(branches), len(branches) + 3)
        branches += [_make_ciip_fn(8, **ckw), _make_ciip_fn(16, **ckw),
                     _make_ciip_fn(32, **ckw)]
    if mtt:
        rkw = dict(frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x,
                   qp=qp, bd=bd, encode=encode, refs=refs, rdoq=rdoq,
                   lam_rd=jnp.asarray(lam_rd, jnp.int32), dq=dq)
        rkw["crs_lut"] = crs_lut if lmcs else None
        nsh = len(planmod.RECT_SHAPES)
        op2b[10:10 + nsh] = np.arange(len(branches), len(branches) + nsh)
        branches += [_make_rect_leaf_fn(rw, rh, **rkw)
                     for (rw, rh) in planmod.RECT_SHAPES]
    if ibc:
        ikw = dict(frame_w=frame_w, frame_h=frame_h, qp=qp, bd=bd,
                   encode=encode, rdoq=rdoq,
                   lam_rd=jnp.asarray(lam_rd, jnp.int32), dq=dq)
        op2b[planmod.OP_IBC0:planmod.OP_IBC0 + 3] = np.arange(
            len(branches), len(branches) + 3)
        branches += [_make_ibc_fn(8, **ikw), _make_ibc_fn(16, **ikw),
                     _make_ibc_fn(32, **ikw)]
    if plt_y is not None:
        pkw = dict(frame_w=frame_w, frame_h=frame_h, plt_y=plt_y,
                   plt_cb=plt_cb, plt_cr=plt_cr)
        op2b[planmod.OP_PLT0:planmod.OP_PLT0 + 3] = np.arange(
            len(branches), len(branches) + 3)
        branches += [_make_plt_fn(8, **pkw), _make_plt_fn(16, **pkw),
                     _make_plt_fn(32, **pkw)]

    def step(carry, slot):
        mt = slot[6] if slot.shape[0] > 6 else jnp.int32(0)
        lf = slot[7] if slot.shape[0] > 7 else jnp.int32(0)
        cm = slot[8] if slot.shape[0] > 8 else jnp.int32(0)
        mr = slot[9] if slot.shape[0] > 9 else jnp.int32(0)
        jc = slot[10] if slot.shape[0] > 10 else jnp.int32(0)
        m1x = slot[11] if slot.shape[0] > 11 else jnp.int32(0)
        m1y = slot[12] if slot.shape[0] > 12 else jnp.int32(0)
        dd = slot[13] if slot.shape[0] > 13 else jnp.int32(0)
        wdx = slot[14] if slot.shape[0] > 14 else jnp.int32(BCW_DEFAULT)
        ip = slot[15] if slot.shape[0] > 15 else jnp.int32(0)
        br = jnp.asarray(op2b)[jnp.clip(slot[0], 0, planmod.OP_MAX)]
        return jax.lax.switch(
            br, branches, carry,
            slot[1], slot[2], slot[3], slot[4], slot[5], mt, lf, cm,
            mr, jc, m1x, m1y, dd, wdx, ip), None

    while slots.shape[1] < 16:
        slots = jnp.concatenate(
            [slots, jnp.zeros((slots.shape[0], 1), jnp.int32)], axis=1)
    carry, _ = jax.lax.scan(step, carry, slots)
    by, bcb, bcr, ly, lcb, lcr = carry[:6]
    return (by[1:frame_h + 1, 1:frame_w + 1],
            bcb[1:h2 + 1, 1:w2 + 1], bcr[1:h2 + 1, 1:w2 + 1],
            ly, lcb, lcr, carry[9], carry[10], carry[11], carry[12],
            carry[13])


def make_slots(dec: FrameDecisions, frame_h: int, frame_w: int,
               ctu: int = 64) -> np.ndarray:
    op, xs, ys, modes, mv0, mv1, dirs = planmod.leaf_plan(dec, frame_h,
                                                          frame_w, ctu)
    mts = dec.mts8[ys // 8, xs // 8].astype(np.int32) \
        if dec.mts8 is not None else np.zeros_like(op)
    lf = dec.lfnst8[ys // 8, xs // 8].astype(np.int32) \
        if dec.lfnst8 is not None else np.zeros_like(op)
    cm = dec.cmode8[ys // 8, xs // 8].astype(np.int32) \
        if dec.cmode8 is not None else np.zeros_like(op)
    mr = dec.mrl8[ys // 8, xs // 8].astype(np.int32) \
        if dec.mrl8 is not None else np.zeros_like(op)
    jc = dec.jccr8[ys // 8, xs // 8].astype(np.int32) \
        if dec.jccr8 is not None else np.zeros_like(op)
    ip = dec.isp8[ys // 8, xs // 8].astype(np.int32) \
        if dec.isp8 is not None else np.zeros_like(op)
    z = np.zeros_like(op)
    return np.stack([op, xs, ys, modes, mv0[:, 0], mv0[:, 1], mts, lf, cm,
                     mr, jc, z, z, z, z, ip], axis=1).astype(np.int32)


def make_slots_split(dec: FrameDecisions, frame_h: int, frame_w: int,
                     ctu: int = 64):
    """(scan_slots, {8/16/32: inter_slot_arrays}) — inter leaves pulled out
    of the sequential scan (op -> skip) into fixed-capacity per-size batches
    for the phase-A pass.  Invalid rows use x = y = 2^20 (positive
    out-of-bounds; scatter-dropped, gathers clamp)."""
    op, xs, ys, modes, mv0, mv1, dirs = planmod.leaf_plan(dec, frame_h,
                                                          frame_w, ctu)
    mts = dec.mts8[ys // 8, xs // 8].astype(np.int32) \
        if dec.mts8 is not None else np.zeros_like(op)
    lf = dec.lfnst8[ys // 8, xs // 8].astype(np.int32) \
        if dec.lfnst8 is not None else np.zeros_like(op)
    cm = dec.cmode8[ys // 8, xs // 8].astype(np.int32) \
        if dec.cmode8 is not None else np.zeros_like(op)
    mr = dec.mrl8[ys // 8, xs // 8].astype(np.int32) \
        if dec.mrl8 is not None else np.zeros_like(op)
    jc = dec.jccr8[ys // 8, xs // 8].astype(np.int32) \
        if dec.jccr8 is not None else np.zeros_like(op)
    widx = (dec.bcw8[ys // 8, xs // 8].astype(np.int32)
            if dec.bcw8 is not None
            else np.full_like(op, BCW_DEFAULT))
    ip = dec.isp8[ys // 8, xs // 8].astype(np.int32) \
        if dec.isp8 is not None else np.zeros_like(op)
    slots = np.stack([op, xs, ys, modes, mv0[:, 0], mv0[:, 1], mts, lf, cm,
                      mr, jc, mv1[:, 0], mv1[:, 1], dirs, widx, ip],
                     axis=1).astype(np.int32)
    inter = {}
    for ri, (rw, rh) in enumerate(planmod.RECT_SHAPES):
        opv = planmod.OP_RECT_INTER0 + ri
        cap = (frame_h // rh) * (frame_w // rw)
        arr = np.full((cap, 7), 1 << 20, np.int32)
        m = op == opv
        k = int(m.sum())
        arr[:k, 0] = xs[m]
        arr[:k, 1] = ys[m]
        arr[:k, 2] = mv0[m, 0]
        arr[:k, 3] = mv0[m, 1]
        arr[:k, 4] = mv1[m, 0]
        arr[:k, 5] = mv1[m, 1]
        arr[:k, 6] = dirs[m]
        arr[k:, 2:] = 0
        inter[(rw, rh)] = arr
    for i, s in enumerate((8, 16, 32)):
        opv = i + 4
        cap = (frame_h // s) * (frame_w // s)
        # dummy coordinate must be positive-out-of-bounds: jnp .at[] wraps
        # negative indices instead of dropping them
        arr = np.full((cap, 13), 1 << 20, np.int32)
        m = op == opv
        k = int(m.sum())
        arr[:k, 0] = xs[m]
        arr[:k, 1] = ys[m]
        arr[:k, 2] = mv0[m, 0]
        arr[:k, 3] = mv0[m, 1]
        arr[:k, 4] = mv1[m, 0]
        arr[:k, 5] = mv1[m, 1]
        arr[:k, 6] = dirs[m]
        arr[:k, 7] = (dec.bcw8[ys[m] // 8, xs[m] // 8].astype(np.int32)
                      if dec.bcw8 is not None else BCW_DEFAULT)
        arr[:k, 8] = (dec.sbt8[ys[m] // 8, xs[m] // 8].astype(np.int32)
                      if dec.sbt8 is not None else 0)
        arr[:k, 9] = (dec.gpm8[ys[m] // 8, xs[m] // 8].astype(np.int32)
                      if dec.gpm8 is not None else 0)
        if dec.aff8 is not None:
            arr[:k, 10] = dec.aff8[ys[m] // 8, xs[m] // 8].astype(np.int32)
            arr[:k, 11] = dec.admv8[ys[m] // 8, xs[m] // 8, 0]
            arr[:k, 12] = dec.admv8[ys[m] // 8, xs[m] // 8, 1]
        else:
            arr[:k, 10:] = 0
        arr[k:, 2:] = 0
        arr[k:, 7] = BCW_DEFAULT
        inter[s] = arr
    # ops stay canonical: frame_scan's op->branch table routes phase-A
    # ops (4-6 square inter, 14-17 rect inter) to the no-op branch
    return slots, inter


def pad_refs(rec_planes):
    """Margin-pad filtered recon planes for use as MC references."""
    return (np.pad(rec_planes[0], REF_MARGIN, mode="edge"),
            np.pad(rec_planes[1], REF_MARGIN // 2, mode="edge"),
            np.pad(rec_planes[2], REF_MARGIN // 2, mode="edge"))


@jax.jit
def _pad_refs_jit(y, cb, cr):
    return (jnp.pad(y, REF_MARGIN, mode="edge"),
            jnp.pad(cb, REF_MARGIN // 2, mode="edge"),
            jnp.pad(cr, REF_MARGIN // 2, mode="edge"))


def pad_refs_dev(rec_planes):
    """pad_refs twin producing DEVICE arrays (device-resident DPB: the
    23ms-latency / ~30MB/s axon tunnel makes per-frame reference
    re-uploads the dominant cost otherwise).  Bit-identical to np.pad
    edge."""
    return _pad_refs_jit(jnp.asarray(rec_planes[0]),
                         jnp.asarray(rec_planes[1]),
                         jnp.asarray(rec_planes[2]))
