"""Batched mode & partition decision on device — twin of spec/decide.py.

The dense (block x 67-mode) candidate tensor is evaluated in one vmapped pass
per block size: reference build (original neighbours, in-frame availability),
all-mode prediction, 8x8-tiled Hadamard SATD (MXU matmuls), integer
SATD<<8 + bits*lambda cost, argmin.  The QT partition is then chosen by
masked cost comparison on host (trivial arithmetic).  Integer arithmetic is
identical to the spec reference, so decisions match bit-for-bit
(tests/test_decide_parity.py) — the SURVEY.md §7.3.2 "batched candidate
tensor, masked reduce-min" redesign of VTM:EncoderLib/EncCu.cpp xCompressCU /
IntraSearch::estIntraPredLumaQT.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom
from ..kernels import intra_pred
from ..spec.codec import FrameDecisions
from ..spec.decide import MODE_BITS, SPLIT_BITS, lambda_satd_fp

_H8 = np.array([[1]], np.int32)
while _H8.shape[0] < 8:
    _H8 = np.block([[_H8, _H8], [_H8, -_H8]])
_H8 = _H8.astype(np.int32)
_MODE_BITS = np.asarray(MODE_BITS, np.int32)


def _satd(diff, s: int):
    """Tiled 8x8 Hadamard SATD, per-tile rounding as in spec.decide."""
    t = s // 8
    d = diff.reshape(t, 8, t, 8).transpose(0, 2, 1, 3).reshape(t * t, 8, 8)
    h8 = jnp.asarray(_H8)
    x = jnp.matmul(h8, d.astype(jnp.int32),
                   preferred_element_type=jnp.int32)
    x = jnp.matmul(x, h8, preferred_element_type=jnp.int32)
    per_tile = (jnp.abs(x).sum(axis=(1, 2)) + 4) >> 3
    return per_tile.sum()


_H4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1],
                [1, 1, -1, -1], [1, -1, -1, 1]], np.int32)


def _satd4_rect(diff, w: int, h: int):
    """Tiled 4x4 Hadamard SATD of an (h, w) diff — twin of spec
    block_satd4 (ISP stripes)."""
    th, tw = h // 4, w // 4
    d = diff.reshape(th, 4, tw, 4).transpose(0, 2, 1, 3).reshape(th * tw,
                                                                 4, 4)
    h4 = jnp.asarray(_H4)
    x = jnp.matmul(h4, d.astype(jnp.int32), preferred_element_type=jnp.int32)
    x = jnp.matmul(x, h4, preferred_element_type=jnp.int32)
    per_tile = (jnp.abs(x).sum(axis=(1, 2)) + 2) >> 2
    return per_tile.sum()


def _satd_rect8(diff, w: int, h: int):
    """Tiled 8x8 Hadamard SATD of an (h, w) diff — twin of spec
    block_satd on rectangles."""
    th, tw = h // 8, w // 8
    d = diff.reshape(th, 8, tw, 8).transpose(0, 2, 1, 3).reshape(th * tw,
                                                                 8, 8)
    h8 = jnp.asarray(_H8)
    x = jnp.matmul(h8, d.astype(jnp.int32), preferred_element_type=jnp.int32)
    x = jnp.matmul(x, h8, preferred_element_type=jnp.int32)
    per_tile = (jnp.abs(x).sum(axis=(1, 2)) + 4) >> 3
    return per_tile.sum()


def rect_size_pass(buf, lam, *, bw: int, bh: int, frame_w: int,
                   frame_h: int, bd: int = 8, sy: int | None = None,
                   sx: int | None = None, oy: int = 0, ox: int = 0,
                   mfp=None):
    """Best (cost, mode) per (bw x bh) rect block over the 67 regular
    modes — twin of spec rect_intra_grid (square-only tools excluded).
    Blocks tile at stride (sy, sx) from offset (oy, ox) (defaults dense);
    launches chunked over the block grid (see size_pass)."""
    sy = bh if sy is None else sy
    sx = bw if sx is None else sx
    nby = (frame_h - oy - bh) // sy + 1
    nbx = (frame_w - ox - bw) // sx + 1
    gx, gy = np.meshgrid(np.arange(nbx, dtype=np.int32) * sx + ox,
                         np.arange(nby, dtype=np.int32) * sy + oy)
    coords = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int32)
    n = coords.shape[0]
    chunk = max(256, _CHUNK_PX // (bw * bh))
    if mfp is None:
        mfp = _MODE_BITS.astype(np.int32) << 8
    jmfp = jnp.asarray(np.asarray(mfp, np.int32))
    if n <= chunk:
        outs = [_rect_pass_chunk(buf, lam, jnp.asarray(coords), jmfp, bw=bw,
                                 bh=bh, frame_w=frame_w, frame_h=frame_h,
                                 bd=bd)]
    else:
        n_pad = -(-n // chunk) * chunk
        cpad = np.concatenate(
            [coords, np.tile(coords[:1], (n_pad - n, 1))], axis=0)
        outs = [_rect_pass_chunk(buf, lam, jnp.asarray(cpad[c0:c0 + chunk]),
                                 jmfp, bw=bw, bh=bh, frame_w=frame_w,
                                 frame_h=frame_h, bd=bd)
                for c0 in range(0, n_pad, chunk)]
    cat = [jnp.concatenate([o[k] for o in outs])[:n].reshape(nby, nbx)
           for k in range(2)]
    return tuple(cat)


@functools.partial(jax.jit, static_argnames=("bw", "bh", "frame_w",
                                             "frame_h", "bd"))
def _rect_pass_chunk(buf, lam, coords, mfp, *, bw: int, bh: int,
                     frame_w: int, frame_h: int, bd: int = 8):
    modes = jnp.arange(rom.NUM_LUMA_MODE, dtype=jnp.int32)
    lam32 = jnp.asarray(lam, jnp.int32)
    bits = (mfp * lam32) >> 8

    def per_block(xy):
        x, y = xy[0], xy[1]
        top, left = intra_pred.build_references_rect(
            buf, x, y, w=bw, h=bh, is_luma=True, frame_w=frame_w,
            frame_h=frame_h, n_ctu_x=frame_w // 64, bd=bd,
            in_frame_only=True)
        blk = jax.lax.dynamic_slice(buf, (y + 1, x + 1), (bh, bw))

        def per_mode(m):
            pred = intra_pred.predict_rect(top, left, m, w=bw, h=bh,
                                           is_luma=True, bd=bd)
            return _satd_rect8(blk - pred, bw, bh)

        satds = jax.vmap(per_mode)(modes)
        costs = (satds << 8) + bits[:rom.NUM_LUMA_MODE]
        best = jnp.argmin(costs).astype(jnp.int32)
        return costs[best], best

    return jax.vmap(per_block)(coords)


_BT_SHAPES = ((16, 8), (8, 16), (32, 16), (16, 32))


def _rect_keys(tt: bool):
    from ..spec.decide import TT_GEOM
    keys = [(bw, bh, None, None, 0, 0) for (bw, bh) in _BT_SHAPES]
    names = list(_BT_SHAPES)
    if tt:
        for key, (bw, bh, sy, sx, oy, ox) in TT_GEOM.items():
            keys.append((bw, bh, sy, sx, oy, ox))
            names.append(key)
    return names, keys


def _rect_grids_intra(jbuf, lam, w, h, bd, tt: bool = False, B=None):
    """Host dict {(bw, bh) | tt-key: (cost int64, mode)} for the 4 BT
    shapes (+ the 4 TT stripe geometries when ``tt``)."""
    out = {}
    names, keys = _rect_keys(tt)
    for name, (bw, bh, sy, sx, oy, ox) in zip(names, keys):
        c, m = rect_size_pass(jbuf, np.int32(lam), bw=bw, bh=bh, frame_w=w,
                              frame_h=h, bd=bd, sy=sy, sx=sx, oy=oy, ox=ox,
                              mfp=B.mode_fp if B is not None else None)
        out[name] = (np.asarray(c).astype(np.int64), np.asarray(m))
    return out


def _rect_grids_inter(jbuf, jorig, refs_p80, memaps, lam, w, h, bd,
                      tt: bool = False, B=None, planes=None):
    """Host dict {(bw, bh) | tt-key: (cost, mode, kind, mv0, mv1)} — twin
    of spec rect_inter_grid, built from the device rect passes."""
    from . import me as jme
    out = {}
    names, keys = _rect_keys(tt)
    for name, (bw, bh, sy, sx, oy, ox) in zip(names, keys):
        ic, im = rect_size_pass(jbuf, np.int32(lam), bw=bw, bh=bh,
                                frame_w=w, frame_h=h, bd=bd, sy=sy, sx=sx,
                                oy=oy, ox=ox,
                                mfp=B.mode_fp if B is not None else None)
        icost = np.asarray(ic).astype(np.int64)
        imode = np.asarray(im)
        ucost, umv = [], []
        for lst, refp in enumerate(refs_p80):
            rc, rmv = jme.refine_pass(jorig, refp, memaps[lst][name][1],
                                      np.int32(lam), s=bw, frame_w=w,
                                      frame_h=h, bd=bd, bh=bh, sy=sy,
                                      sx=sx, oy=oy, ox=ox,
                                      planes=None if planes is None
                                      else planes[lst])
            ucost.append(np.asarray(rc).astype(np.int64))
            umv.append(np.asarray(rmv))
        if len(refs_p80) == 1:
            costs = np.stack([icost, ucost[0]])
            kind = np.argmin(costs, axis=0).astype(np.int32)
            out[name] = (np.min(costs, axis=0), imode, kind, umv[0],
                         np.zeros_like(umv[0]))
            continue
        bcost, _ = jme.bi_cost_pass(jorig, refs_p80[0], refs_p80[1],
                                    jnp.asarray(umv[0]), jnp.asarray(umv[1]),
                                    np.int32(lam), s=bw, frame_w=w,
                                    frame_h=h, bd=bd, bcw=False, bh=bh,
                                    sy=sy, sx=sx, oy=oy, ox=ox,
                                    planes0=None if planes is None
                                    else planes[0],
                                    planes1=None if planes is None
                                    else planes[1])
        bcost = np.asarray(bcost).astype(np.int64)
        costs = np.stack([icost, ucost[0], ucost[1], bcost])
        kind = np.argmin(costs, axis=0).astype(np.int32)
        out[name] = (np.min(costs, axis=0), imode, kind, umv[0], umv[1])
    return out


# blocks per device launch: bounded so the (blocks x modes x s x s)
# candidate tensor stays ~100-300 MB.  One big unchunked program at 1080p
# both bloats compile time and triggers an axon-runtime kernel fault when
# the three size passes execute back-to-back asynchronously (reproduced
# 2026-08-21; serialized single passes are fine) — chunking fixes both.
_CHUNK_PX = 1 << 18


def size_pass(buf, lam, *, s: int, frame_w: int, frame_h: int, bd: int = 8,
              mip: bool = False, mrl: bool = False, isp: bool = False,
              B=None):
    """Best (cost, mode, mrl, isp) per s-block over all 67 modes (+16 MIP
    ids), then the winner refined over the 5-candidate list [base, MRL 1,
    MRL 2, ISP-H, ISP-V] — twin of spec _block_decision.

    buf: margin-padded original luma plane (as in pipeline/recon buffers).
    Returns int32 (nby, nbx) arrays (cost, mode, mrl, isp); launches are
    chunked over the block grid (identical per-block arithmetic).
    """
    nby, nbx = frame_h // s, frame_w // s
    gx, gy = np.meshgrid(np.arange(nbx, dtype=np.int32) * s,
                         np.arange(nby, dtype=np.int32) * s)
    coords = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int32)
    n = coords.shape[0]
    chunk = max(256, _CHUNK_PX // (s * s))
    if B is None:
        from ..cabac import estimate as est
        B = est.decision_bits(2, 32)
    nmode = rom.NUM_LUMA_MODE + 2 * rom.NUM_MIP_MODES
    jmfp = jnp.asarray(np.asarray(B.mode_fp[:nmode], np.int32))
    extra_reg = ((B.mrl0_fp if mrl else 0) + (B.isp0_fp if isp else 0)
                 + (B.mip0_fp if mip else 0))
    ispd_base = (B.mrl0_fp if mrl else 0) + B.ispd_fp
    jsc = jnp.asarray(np.asarray(
        [extra_reg, B.mrl1_fp, B.mrl2_fp, ispd_base], np.int32))
    if n <= chunk:
        outs = [_size_pass_chunk(buf, lam, jnp.asarray(coords), jmfp, jsc,
                                 s=s, frame_w=frame_w, frame_h=frame_h,
                                 bd=bd, mip=mip, mrl=mrl, isp=isp)]
    else:
        n_pad = -(-n // chunk) * chunk
        cpad = np.concatenate(
            [coords, np.zeros((n_pad - n, 2), np.int32)], axis=0)
        outs = [_size_pass_chunk(buf, lam, jnp.asarray(cpad[c0:c0 + chunk]),
                                 jmfp, jsc, s=s, frame_w=frame_w,
                                 frame_h=frame_h, bd=bd, mip=mip, mrl=mrl,
                                 isp=isp)
                for c0 in range(0, n_pad, chunk)]
    cat = [jnp.concatenate([o[k] for o in outs])[:n].reshape(nby, nbx)
           for k in range(4)]
    return tuple(cat)


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd", "mip", "mrl", "isp"))
def _size_pass_chunk(buf, lam, coords, mfp, sc, *, s: int, frame_w: int,
                     frame_h: int, bd: int = 8, mip: bool = False,
                     mrl: bool = False, isp: bool = False):
    from ..spec.codec import isp_parts
    modes = jnp.arange(rom.NUM_LUMA_MODE, dtype=jnp.int32)
    lam32 = jnp.asarray(lam, jnp.int32)
    SENT = jnp.int32(1 << 30)

    def per_block(xy):
        x, y = xy[0], xy[1]
        top, left = intra_pred.build_references(
            buf, x, y, s=s, is_luma=True, frame_w=frame_w, frame_h=frame_h,
            n_ctu_x=frame_w // 64, bd=bd, in_frame_only=True)
        blk = jax.lax.dynamic_slice(buf, (y + 1, x + 1), (s, s))

        def per_mode(m):
            pred = intra_pred.predict(top, left, m, s=s, is_luma=True, bd=bd)
            return _satd(blk - pred, s)

        satds = jax.vmap(per_mode)(modes)
        costs = ((satds << 8)
                 + (((mfp[:rom.NUM_LUMA_MODE] + sc[0]) * lam32) >> 8))
        if mip:
            def per_mip(m):
                pred = intra_pred.mip_predict_j(top, left, m, s=s, bd=bd)
                return _satd(blk - pred, s)
            msatds = jax.vmap(per_mip)(
                jnp.arange(2 * rom.NUM_MIP_MODES, dtype=jnp.int32))
            costs = jnp.concatenate(
                [costs, (msatds << 8)
                 + ((mfp[rom.NUM_LUMA_MODE:] * lam32) >> 8)])
        best = jnp.argmin(costs)
        bcost = costs[best]
        best = best.astype(jnp.int32)
        if not (mrl or isp):
            return bcost, best, jnp.int32(0), jnp.int32(0)
        is_reg = best < rom.NUM_LUMA_MODE
        mode_c = jnp.clip(best, 2, rom.NUM_LUMA_MODE - 1)
        mode_r = jnp.minimum(best, rom.NUM_LUMA_MODE - 1)

        def mrl_cost(k):
            tk, lk = intra_pred.build_references(
                buf, x, y, s=s, is_luma=True, frame_w=frame_w,
                frame_h=frame_h, n_ctu_x=frame_w // 64, bd=bd,
                in_frame_only=True, ref_line=k)
            pred = intra_pred.predict(tk, lk, mode_c, s=s, is_luma=True,
                                      bd=bd, ref_line=k)
            mrlk = jnp.where(k == 1, sc[1], sc[2])
            c = (_satd(blk - pred, s) << 8) \
                + (((mfp[mode_c] + mrlk) * lam32) >> 8)
            return jnp.where(is_reg & (best >= 2), c, SENT)

        def isp_cost(d):
            total = jnp.int32(0)
            for (dx, dy, w_st, h_st) in isp_parts(s, d):
                tk, lk = intra_pred.build_references_rect(
                    buf, x + dx, y + dy, w=w_st, h=h_st, is_luma=True,
                    frame_w=frame_w, frame_h=frame_h,
                    n_ctu_x=frame_w // 64, bd=bd, in_frame_only=True)
                pred = intra_pred.predict_rect(tk, lk, mode_r, w=w_st,
                                               h=h_st, is_luma=True, bd=bd)
                bs = jax.lax.dynamic_slice(buf, (y + dy + 1, x + dx + 1),
                                           (h_st, w_st))
                total = total + _satd4_rect(bs - pred, w_st, h_st)
            ibits = ((mfp[mode_r] + sc[3]) * lam32) >> 8
            return jnp.where(is_reg, (total << 8) + ibits, SENT)

        cands = [bcost]
        cands += [mrl_cost(jnp.int32(1)), mrl_cost(jnp.int32(2))] \
            if mrl else [SENT, SENT]
        cands += [isp_cost(1), isp_cost(2)] if isp else [SENT, SENT]
        arr = jnp.stack(cands)
        k = jnp.argmin(arr).astype(jnp.int32)
        mrl_out = jnp.where(k <= 2, k, 0)
        isp_out = jnp.where(k <= 2, 0, k - 2)
        return arr[k], best, mrl_out, isp_out

    return jax.vmap(per_block)(coords)


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd"))
def ciip_pass(buf, refp0, refp1, kind, mv0, mv1, bwidx, *, s: int,
              frame_w: int, frame_h: int, bd: int = 8):
    """CIIP refinement SADs per s-block — twin of spec ciip_sad_pass.

    buf: margin-padded original luma; refp0/refp1: REF_MARGIN-padded
    references; kind (nby, nbx) int32 (0 intra, 1 L0, 2 L1, 3 BI);
    mv0/mv1 (nby, nbx, 2) 1/16-pel.  Returns (sad_mc, sad_blend) int32."""
    from ..kernels import mc
    from ..spec.inter import BCW_W
    nby, nbx = frame_h // s, frame_w // s
    mx = (1 << bd) - 1
    bcw_w = jnp.asarray(np.asarray(BCW_W, np.int32))
    xs = jnp.arange(nbx, dtype=jnp.int32) * s
    ys = jnp.arange(nby, dtype=jnp.int32) * s
    gx, gy = jnp.meshgrid(xs, ys)
    flat = jnp.stack([gx.ravel(), gy.ravel(),
                      kind.ravel().astype(jnp.int32),
                      mv0[..., 0].ravel(), mv0[..., 1].ravel(),
                      mv1[..., 0].ravel(), mv1[..., 1].ravel(),
                      bwidx.ravel().astype(jnp.int32)], axis=1)

    def per_block(row):
        x, y, k = row[0], row[1], row[2]
        p0 = mc.mc_luma_block(refp0, x, y, s, row[3], row[4], bd)
        p1 = mc.mc_luma_block(refp1, x, y, s, row[5], row[6], bd)
        w = bcw_w[jnp.clip(row[7], 0, 2)]
        pb = jnp.clip((w * p0 + (8 - w) * p1 + 4) >> 3, 0, mx)
        p = jnp.where(k == 1, p0, jnp.where(k == 2, p1, pb))
        top, left = intra_pred.build_references(
            buf, x, y, s=s, is_luma=True, frame_w=frame_w, frame_h=frame_h,
            n_ctu_x=frame_w // 64, bd=bd, in_frame_only=True)
        pl = intra_pred.predict(top, left, jnp.int32(rom.PLANAR_IDX), s=s,
                                is_luma=True, bd=bd)
        blend = jnp.clip((p + pl + 1) >> 1, 0, mx)
        ob = jax.lax.dynamic_slice(buf, (y + 1, x + 1), (s, s))
        sadm = jnp.abs(ob - p).sum()
        sadb = jnp.abs(ob - blend).sum()
        return (jnp.where(k > 0, sadm, 0).astype(jnp.int32),
                jnp.where(k > 0, sadb, 0).astype(jnp.int32))

    sadm, sadb = jax.vmap(per_block)(flat)
    return sadm.reshape(nby, nbx), sadb.reshape(nby, nbx)


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd"))
def gpm_pass(orig, refp0, refp1, mv0, mv1, *, s: int, frame_w: int,
             frame_h: int, bd: int = 8):
    """Best GPM partition per s-block (twin of spec gpm_sad_pass):
    all-64-mask blend of the two refined uni predictions, SAD argmin.
    Returns (sad, idx) int32 (nby, nbx)."""
    from ..kernels import mc as jmc
    nby, nbx = frame_h // s, frame_w // s
    mx = (1 << bd) - 1
    masks = jnp.asarray(rom.gpm_masks_all(s), jnp.int32)     # (64, s, s)
    xs = jnp.arange(nbx, dtype=jnp.int32) * s
    ys = jnp.arange(nby, dtype=jnp.int32) * s
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    orig = orig.astype(jnp.int32)

    def one(xy, a, b):
        p0 = jmc.mc_luma_block(refp0, xy[0], xy[1], s, a[0], a[1], bd)
        p1 = jmc.mc_luma_block(refp1, xy[0], xy[1], s, b[0], b[1], bd)
        pb = jnp.clip((masks * p0[None] + (8 - masks) * p1[None] + 4) >> 3,
                      0, mx)
        ob = jax.lax.dynamic_slice(orig, (xy[1], xy[0]), (s, s))
        sads = jnp.abs(ob[None] - pb).sum(axis=(1, 2))
        k = jnp.argmin(sads).astype(jnp.int32)
        return sads[k].astype(jnp.int32), k

    sad, idx = jax.vmap(one)(coords, mv0.reshape(-1, 2), mv1.reshape(-1, 2))
    return sad.reshape(nby, nbx), idx.reshape(nby, nbx)


def _bitlen_arr(v: np.ndarray) -> np.ndarray:
    """Vectorised threshold-sum bit length == spec inter.bitlen_int."""
    a = np.abs(v.astype(np.int64))
    return sum((a >= (1 << k)).astype(np.int64) for k in range(15))


def _bitlen_j(v):
    a = jnp.abs(v)
    return sum((a >= (1 << k)).astype(jnp.int32) for k in range(15))


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd"))
def affine_pass(orig, refp, base_mv, lam, aff_fp, *, s: int, frame_w: int,
                frame_h: int, bd: int = 8):
    """Best affine dmv per s-block — twin of spec affine_sad_pass (same
    grid order, (0,0) sentinel-masked, prediction without PROF).
    Returns (cost, dmv) int32, dmv (nby, nbx, 2)."""
    from ..kernels import mc as jmc
    from ..spec.inter import AFF_DELTAS, mv_bits_q
    nby, nbx = frame_h // s, frame_w // s
    deltas = [(dx_, dy_) for dy_ in AFF_DELTAS for dx_ in AFF_DELTAS]
    lam32 = jnp.asarray(lam, jnp.int32)
    SENT = jnp.int32(1 << 30)
    xs = jnp.arange(nbx, dtype=jnp.int32) * s
    ys = jnp.arange(nby, dtype=jnp.int32) * s
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    orig = orig.astype(jnp.int32)
    darr = jnp.asarray(np.asarray(deltas, np.int32))

    def one(xy, b):
        bbits = 2 + 2 * _bitlen_j(b[0] >> 2) + 2 * _bitlen_j(b[1] >> 2)
        ob = jax.lax.dynamic_slice(orig, (xy[1], xy[0]), (s, s))
        costs = []
        for (dx_, dy_) in deltas:
            if dx_ == 0 and dy_ == 0:
                costs.append(SENT)
                continue
            pred = jmc.affine_pred_luma_j(refp, xy[0], xy[1], s, b[0],
                                          b[1], dx_, dy_, bd, prof=False)
            sad = jnp.abs(ob - pred).sum()
            bits = bbits + mv_bits_q(dx_ >> 2, dy_ >> 2)
            costs.append((sad << 8) + lam32 * bits
                         + ((jnp.asarray(aff_fp, jnp.int32) * lam32) >> 8))
        arr = jnp.stack(costs)
        k = jnp.argmin(arr).astype(jnp.int32)
        return arr[k], darr[k]

    cost, dmv = jax.vmap(one)(coords, base_mv.reshape(-1, 2))
    return cost.reshape(nby, nbx), dmv.reshape(nby, nbx, 2)


def decide_frame_device(orig_y: np.ndarray, qp: int, bd: int = 8,
                        mip: bool = False, mrl: bool = False,
                        isp: bool = False, mtt: bool = False,
                        ibc: bool = False, tt: bool = False,
                        plt: bool = False):
    """Launch the I-frame decision device passes asynchronously.

    Returns an opaque handle of un-materialised jax arrays; pass to
    decide_frame_assemble to block and build the FrameDecisions.  The
    split lets the sequence encoder overlap the previous frame's host
    entropy/filters with this frame's device compute."""
    from ..cabac import estimate as est
    h, w = orig_y.shape
    lam = lambda_satd_fp(qp)
    B = est.decision_bits(2, qp)
    buf = np.zeros((h + 1 + intra_pred.MARGIN, w + 1 + intra_pred.MARGIN),
                   np.int32)
    buf[1:h + 1, 1:w + 1] = orig_y
    jbuf = jnp.asarray(buf)
    res = {s: size_pass(jbuf, np.int32(lam), s=s, frame_w=w, frame_h=h,
                        bd=bd, mip=mip, mrl=mrl, isp=isp, B=B)
           for s in (8, 16, 32)}
    ipass = None
    if ibc:
        from . import me as jme
        ipass = jme.ibc_pass(jnp.asarray(orig_y, jnp.int32), np.int32(lam),
                             frame_w=w, frame_h=h,
                             ibc_fp=np.int32(B.ibc_fp))
    rects = None
    if mtt:
        rects = {}
        names, keys = _rect_keys(tt)
        for name, (bw, bh, sy, sx, oy, ox) in zip(names, keys):
            rects[name] = rect_size_pass(jbuf, np.int32(lam), bw=bw,
                                         bh=bh, frame_w=w, frame_h=h,
                                         bd=bd, sy=sy, sx=sx, oy=oy, ox=ox,
                                         mfp=B.mode_fp)
    return dict(res=res, ipass=ipass, rects=rects, h=h, w=w, lam=lam,
                mtt=mtt, ibc=ibc, plt=plt, bd=bd, orig_y=orig_y, B=B)


class _ArrRef:
    __slots__ = ("i",)

    def __init__(self, i):
        self.i = i


def _tree_get(o):
    """jax.device_get over an arbitrary nested dict/list/tuple container
    with MIXED dict key types (which jax pytree flattening rejects):
    collects device arrays, fetches them in ONE round trip, rebuilds."""
    import jax
    arrs = []

    def walk(v):
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(walk(x) for x in v)
        if isinstance(v, jax.Array):
            arrs.append(v)
            return _ArrRef(len(arrs) - 1)
        return v

    skel = walk(o)
    from ..core import xfer
    vals = xfer.device_get(arrs)

    def fill(v):
        if isinstance(v, _ArrRef):
            return vals[v.i]
        if isinstance(v, dict):
            return {k: fill(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(fill(x) for x in v)
        return v

    return fill(skel)


def decide_frame_assemble(hd) -> FrameDecisions:
    """Block on the device results and run the host bottom-up assembly
    (identical arithmetic to the one-call decide_frame)."""
    hd = _tree_get(hd)         # ONE tunnel round trip for the whole tree
    res, h, w, lam = hd["res"], hd["h"], hd["w"], hd["lam"]
    B = hd["B"]
    best8_cost = np.asarray(res[8][0]).astype(np.int64)
    best8_mode = np.asarray(res[8][1])
    best8_mrl = np.array(res[8][2])
    best8_isp = np.array(res[8][3])
    best16_cost = np.asarray(res[16][0]).astype(np.int64)
    best16_mode = np.asarray(res[16][1])
    best16_mrl = np.array(res[16][2])
    best16_isp = np.array(res[16][3])
    best32_cost = np.asarray(res[32][0]).astype(np.int64)
    best32_mode = np.asarray(res[32][1])
    best32_mrl = np.array(res[32][2])
    best32_isp = np.array(res[32][3])

    ibc_data = None
    if hd["ibc"]:
        ipass = hd["ipass"]
        ibc_data = {}
        for grid, bc, bk, bi in ((8, best8_cost, best8_mrl, best8_isp),
                                 (16, best16_cost, best16_mrl, best16_isp),
                                 (32, best32_cost, best32_mrl,
                                  best32_isp)):
            ic = np.asarray(ipass[grid][0]).astype(np.int64)
            bv = np.asarray(ipass[grid][1])
            use = ic < bc
            bc[:] = np.where(use, ic, bc)
            bk[:] = np.where(use, 0, bk)
            bi[:] = np.where(use, 0, bi)
            ibc_data[grid] = (use, bv)

    plt_use = None
    if hd.get("plt"):
        from ..spec.decide import plt_competition
        plt_use = plt_competition(
            hd["orig_y"], lam, hd["bd"], ibc_data,
            {8: (best8_cost, best8_mrl, best8_isp),
             16: (best16_cost, best16_mrl, best16_isp),
             32: (best32_cost, best32_mrl, best32_isp)})

    if hd["mtt"]:
        from ..spec.decide import mtt_assemble_i
        dec = FrameDecisions.empty(h, w)
        sizes = {8: (best8_cost, best8_mode, best8_mrl, best8_isp),
                 16: (best16_cost, best16_mode, best16_mrl, best16_isp),
                 32: (best32_cost, best32_mode, best32_mrl, best32_isp)}
        rgrids = {k: (np.asarray(c).astype(np.int64), np.asarray(m))
                  for k, (c, m) in hd["rects"].items()}
        mtt_assemble_i(dec, sizes, rgrids, lam, ibc_data=ibc_data,
                       plt_use=plt_use, B=B)
        return dec

    dec = FrameDecisions.empty(h, w)
    n16y, n16x = h // 16, w // 16
    n32y, n32x = h // 32, w // 32
    from ..spec.decide import _bl
    sum8 = (best8_cost.reshape(n16y, 2, n16x, 2).sum(axis=(1, 3))
            + _bl(B.split_fp, lam))
    split16 = sum8 < best16_cost
    cost16 = np.where(split16, sum8, best16_cost)
    sum16 = (cost16.reshape(n32y, 2, n32x, 2).sum(axis=(1, 3))
             + _bl(B.split_fp, lam))
    split32 = sum16 < best32_cost
    dec.split32[:] = split32.astype(np.uint8)
    dec.split16[:] = (split16
                      & np.kron(split32, np.ones((2, 2), bool))).astype(
                          np.uint8)
    m = np.kron(best32_mode, np.ones((4, 4), np.int32))
    m16 = np.kron(best16_mode, np.ones((2, 2), np.int32))
    use16 = np.kron(split32.astype(bool), np.ones((4, 4), bool))
    m = np.where(use16, m16, m)
    use8 = np.kron(dec.split16.astype(bool), np.ones((2, 2), bool))
    dec.modes8[:] = np.where(use8, best8_mode, m)
    k = np.kron(best32_mrl, np.ones((4, 4), np.int32))
    k = np.where(use16, np.kron(best16_mrl, np.ones((2, 2), np.int32)), k)
    k = np.where(use8, best8_mrl, k)
    dec.mrl8[:] = k.astype(np.uint8)
    di = np.kron(best32_isp, np.ones((4, 4), np.int32))
    di = np.where(use16, np.kron(best16_isp, np.ones((2, 2), np.int32)), di)
    di = np.where(use8, best8_isp, di)
    dec.isp8[:] = di.astype(np.uint8)
    if ibc_data is not None:
        from ..spec.decide import _fill_ibc
        _fill_ibc(dec, ibc_data, use16, use8)
    if plt_use is not None:
        from ..spec.decide import _fill_plt
        _fill_plt(dec, plt_use, use16, use8)
    return dec


def decide_frame(orig_y: np.ndarray, qp: int, bd: int = 8,
                 mip: bool = False, mrl: bool = False,
                 isp: bool = False, mtt: bool = False,
                 ibc: bool = False, tt: bool = False,
                 plt: bool = False) -> FrameDecisions:
    """Device-batched decisions for a padded luma plane (host assembly)."""
    return decide_frame_assemble(decide_frame_device(
        orig_y, qp, bd, mip=mip, mrl=mrl, isp=isp, mtt=mtt, ibc=ibc,
        tt=tt, plt=plt))


def decide_frame_p(orig_y: np.ndarray, ref_y, qp: int,
                   bd: int = 8, mip: bool = False,
                   mrl: bool = False, ciip: bool = False,
                   isp: bool = False, affine: bool = False,
                   mtt: bool = False, tt: bool = False,
                   prepadded: bool = False,
                   me_ext: bool = True) -> FrameDecisions:
    """Device-batched P-frame decisions (twin of spec decide_frame_p).
    prepadded: see decide_frame_b."""
    from ..cabac import estimate as est
    from ..spec.inter import ME_RANGE
    from . import me as jme
    h, w = orig_y.shape
    lam = lambda_satd_fp(qp)
    B = est.decision_bits(1, qp)
    buf = np.zeros((h + 1 + intra_pred.MARGIN, w + 1 + intra_pred.MARGIN),
                   np.int32)
    buf[1:h + 1, 1:w + 1] = orig_y
    jbuf = jnp.asarray(buf)
    from ..spec.inter import REF_MARGIN
    if prepadded:
        refp80 = jnp.asarray(ref_y)
    else:
        refp80 = jnp.asarray(np.pad(ref_y.astype(np.int32), REF_MARGIN,
                                    mode="edge"))
    memaps = jme.me_pass(jnp.asarray(orig_y, jnp.int32), refp80,
                         np.int64(lam), frame_w=w, frame_h=h,
                         tt=tt and mtt, ext=me_ext)
    jorig = jnp.asarray(orig_y, jnp.int32)
    planes1r = [jme.quarter_phase_planes(refp80, bd)]

    size_data = {}
    for s in (8, 16, 32):
        icost, imode, imrl, iisp = size_pass(jbuf, np.int32(lam), s=s,
                                             frame_w=w, frame_h=h, bd=bd,
                                             mip=mip, mrl=mrl, isp=isp,
                                             B=B)
        icost = np.asarray(icost).astype(np.int64)
        imode = np.asarray(imode)
        imrl = np.asarray(imrl)
        iisp = np.asarray(iisp)
        rcost, rmv = jme.refine_pass(jorig, refp80, memaps[s][1],
                                     np.int32(lam), s=s, frame_w=w,
                                     frame_h=h, bd=bd,
                                     planes=planes1r[0])
        rcost = np.asarray(rcost).astype(np.int64)
        rmv = np.asarray(rmv)
        from ..spec.inter import AFF_MIN_SIZE
        acost = np.full(rcost.shape, np.int64(1) << 60, np.int64)
        admv = np.zeros(rcost.shape + (2,), np.int32)
        if affine and s >= AFF_MIN_SIZE:
            ac, ad = affine_pass(jorig, refp80, jnp.asarray(rmv),
                                 np.int32(lam), np.int32(B.aff_fp), s=s,
                                 frame_w=w, frame_h=h, bd=bd)
            acost = np.asarray(ac).astype(np.int64)
            admv = np.asarray(ad)
        k3 = np.argmin(np.stack([icost, rcost, acost]),
                       axis=0).astype(np.int32)
        use_inter = k3 > 0
        affu = k3 == 2
        cost = np.min(np.stack([icost, rcost, acost]), axis=0)
        cflag = np.zeros(use_inter.shape, bool)
        if ciip:
            jmv = jnp.asarray(rmv)
            sadm, sadb = ciip_pass(
                jbuf, refp80, refp80,
                jnp.asarray((k3 == 1).astype(np.int32)), jmv, jmv,
                jnp.ones(use_inter.shape, jnp.int32), s=s, frame_w=w,
                frame_h=h, bd=bd)
            sadm = np.asarray(sadm).astype(np.int64)
            sadb = np.asarray(sadb).astype(np.int64)
            cflag = (k3 == 1) & (sadb < sadm)
            cost = np.where(cflag, cost + ((sadb - sadm) << 8), cost)
        size_data[s] = (cost, imode, use_inter, rmv, imrl, cflag, iisp,
                        affu, admv)

    if mtt:
        from ..spec.decide import mtt_assemble_p
        dec = FrameDecisions.empty(h, w)
        rects = _rect_grids_inter(jbuf, jorig, [refp80], [memaps], lam, w,
                                  h, bd, tt=tt, B=B, planes=planes1r)
        mtt_assemble_p(dec, size_data, rects, lam, ciip, affine, B=B)
        return dec

    dec = FrameDecisions.empty(h, w)
    (cost8, imode8, inter8, mv8, mrl8, cf8, isp8a, af8,
     adm8) = size_data[8]
    (cost16, imode16, inter16, mv16, mrl16, cf16, isp16a, af16,
     adm16) = size_data[16]
    (cost32, imode32, inter32, mv32, mrl32, cf32, isp32a, af32,
     adm32) = size_data[32]
    n16y, n16x = h // 16, w // 16
    n32y, n32x = h // 32, w // 32
    from ..spec.decide import _bl
    sum8 = (cost8.reshape(n16y, 2, n16x, 2).sum(axis=(1, 3))
            + _bl(B.split_fp, lam))
    split16 = sum8 < cost16
    c16 = np.where(split16, sum8, cost16)
    sum16 = (c16.reshape(n32y, 2, n32x, 2).sum(axis=(1, 3))
             + _bl(B.split_fp, lam))
    split32 = sum16 < cost32
    dec.split32[:] = split32.astype(np.uint8)
    dec.split16[:] = (split16
                      & np.kron(split32, np.ones((2, 2), bool))).astype(
                          np.uint8)

    def up(a, f):
        return np.kron(a, np.ones((f, f), a.dtype))

    use16 = up(split32.astype(np.uint8), 4).astype(bool)
    use8 = up(dec.split16, 2).astype(bool)
    mode = up(imode32, 4)
    mode = np.where(use16, up(imode16, 2), mode)
    mode = np.where(use8, imode8, mode)
    mrlv = up(mrl32, 4)
    mrlv = np.where(use16, up(mrl16, 2), mrlv)
    mrlv = np.where(use8, mrl8, mrlv)
    itf = up(inter32.astype(np.uint8), 4).astype(bool)
    itf = np.where(use16, up(inter16.astype(np.uint8), 2).astype(bool), itf)
    itf = np.where(use8, inter8, itf)
    mvx = up(mv32[..., 0], 4)
    mvy = up(mv32[..., 1], 4)
    mvx = np.where(use16, up(mv16[..., 0], 2), mvx)
    mvy = np.where(use16, up(mv16[..., 1], 2), mvy)
    mvx = np.where(use8, mv8[..., 0], mvx)
    mvy = np.where(use8, mv8[..., 1], mvy)
    dec.inter8[:] = itf.astype(np.uint8)
    dec.modes8[:] = np.where(itf, 0, mode)
    dec.mrl8[:] = np.where(itf, 0, mrlv).astype(np.uint8)
    ispv = up(isp32a, 4)
    ispv = np.where(use16, up(isp16a, 2), ispv)
    ispv = np.where(use8, isp8a, ispv)
    dec.isp8[:] = np.where(itf, 0, ispv).astype(np.uint8)
    dec.mv8[..., 0] = np.where(itf, mvx, 0)   # already 1/16-pel
    dec.mv8[..., 1] = np.where(itf, mvy, 0)
    if ciip:
        cf = up(cf32.astype(np.uint8), 4)
        cf = np.where(use16, up(cf16.astype(np.uint8), 2), cf)
        cf = np.where(use8, cf8.astype(np.uint8), cf)
        dec.ciip8[:] = np.where(itf, cf, 0).astype(np.uint8)
    if affine:
        af = up(af32.astype(np.uint8), 4)
        af = np.where(use16, up(af16.astype(np.uint8), 2), af)
        af = np.where(use8, af8.astype(np.uint8), af)
        dec.aff8[:] = np.where(itf, af, 0).astype(np.uint8)

        def up3(a, f):
            return np.kron(a, np.ones((f, f, 1), a.dtype))
        adm = up3(adm32, 4)
        adm = np.where(use16[..., None], up3(adm16, 2), adm)
        adm = np.where(use8[..., None], adm8, adm)
        dec.admv8[:] = np.where((itf & (af > 0))[..., None], adm, 0)
    return dec


def decide_frame_b(orig_y: np.ndarray, ref0_y, ref1_y, qp: int,
                   bd: int = 8, mip: bool = False, mrl: bool = False,
                   bcw: bool = False, ciip: bool = False,
                   isp: bool = False, gpm: bool = False,
                   affine: bool = False, mtt: bool = False,
                   tt: bool = False, prepadded: bool = False,
                   me_ext: bool = True):
    """Device-batched B-frame decisions (twin of spec decide_frame_b).

    prepadded=True: ref0_y/ref1_y are REF_MARGIN-edge-padded luma planes
    already on device (device-resident DPB) — the ME_RANGE pad is a crop
    of the same edge padding, bit-identical to padding the raw plane."""
    from ..cabac import estimate as est
    from ..spec.inter import BCW_DEFAULT
    from ..spec.inter import ME_RANGE, REF_MARGIN
    from . import me as jme
    h, w = orig_y.shape
    lam = lambda_satd_fp(qp)
    B = est.decision_bits(0, qp)
    buf = np.zeros((h + 1 + intra_pred.MARGIN, w + 1 + intra_pred.MARGIN),
                   np.int32)
    buf[1:h + 1, 1:w + 1] = orig_y
    jbuf = jnp.asarray(buf)
    jorig = jnp.asarray(orig_y, jnp.int32)
    refs = (ref0_y, ref1_y)
    if prepadded:
        refp80 = [jnp.asarray(r) for r in refs]
    else:
        refp80 = [jnp.asarray(np.pad(r.astype(np.int32), REF_MARGIN,
                                     mode="edge")) for r in refs]
    memaps = [jme.me_pass(jorig, refp80[i], np.int64(lam), frame_w=w,
                          frame_h=h, tt=tt and mtt, ext=me_ext)
              for i in range(2)]
    planes2 = [jme.quarter_phase_planes(refp80[i], bd) for i in range(2)]

    size_data = {}
    for s in (8, 16, 32):
        icost, imode, imrl, iisp = size_pass(jbuf, np.int32(lam), s=s,
                                             frame_w=w, frame_h=h, bd=bd,
                                             mip=mip, mrl=mrl, isp=isp,
                                             B=B)
        icost = np.asarray(icost).astype(np.int64)
        imode = np.asarray(imode)
        imrl = np.asarray(imrl)
        iisp = np.asarray(iisp)
        ucost, umv = [], []
        for lst in range(2):
            rc, rmv = jme.refine_pass(jorig, refp80[lst], memaps[lst][s][1],
                                      np.int32(lam), s=s, frame_w=w,
                                      frame_h=h, bd=bd,
                                      planes=planes2[lst])
            ucost.append(np.asarray(rc).astype(np.int64))
            umv.append(np.asarray(rmv))
        bcost, bwidx = jme.bi_cost_pass(
            jorig, refp80[0], refp80[1], jnp.asarray(umv[0]),
            jnp.asarray(umv[1]), np.int32(lam), s=s, frame_w=w, frame_h=h,
            bd=bd, bcw=bcw,
            bcw_fp=jnp.asarray(np.asarray(B.bcw_fp, np.int32)),
            planes0=planes2[0], planes1=planes2[1])
        bcost = np.asarray(bcost).astype(np.int64)
        bwidx = np.asarray(bwidx)
        from ..spec.inter import AFF_MIN_SIZE
        sent = np.full(icost.shape, np.int64(1) << 60, np.int64)
        a0cost, a1cost = sent, sent
        admv0 = np.zeros(icost.shape + (2,), np.int32)
        admv1 = np.zeros(icost.shape + (2,), np.int32)
        if affine and s >= AFF_MIN_SIZE:
            ac0, ad0 = affine_pass(jorig, refp80[0], jnp.asarray(umv[0]),
                                   np.int32(lam), np.int32(B.aff_fp), s=s,
                                   frame_w=w, frame_h=h, bd=bd)
            ac1, ad1 = affine_pass(jorig, refp80[1], jnp.asarray(umv[1]),
                                   np.int32(lam), np.int32(B.aff_fp), s=s,
                                   frame_w=w, frame_h=h, bd=bd)
            a0cost = np.asarray(ac0).astype(np.int64)
            admv0 = np.asarray(ad0)
            a1cost = np.asarray(ac1).astype(np.int64)
            admv1 = np.asarray(ad1)
        costs = np.stack([icost, ucost[0], ucost[1], bcost, a0cost,
                          a1cost])
        kind = np.argmin(costs, axis=0).astype(np.int32)
        cost = np.min(costs, axis=0)
        cflag = np.zeros(kind.shape, bool)
        if ciip:
            kind_c = np.where(kind <= 3, kind, 0).astype(np.int32)
            sadm, sadb = ciip_pass(
                jbuf, refp80[0], refp80[1], jnp.asarray(kind_c),
                jnp.asarray(umv[0]), jnp.asarray(umv[1]),
                jnp.asarray(bwidx), s=s, frame_w=w, frame_h=h, bd=bd)
            sadm = np.asarray(sadm).astype(np.int64)
            sadb = np.asarray(sadb).astype(np.int64)
            cflag = (kind_c > 0) & (sadb < sadm)
            cost = np.where(cflag, cost + ((sadb - sadm) << 8), cost)
        gval = np.zeros(kind.shape, np.int32)
        if gpm:
            from ..spec.decide import _bl
            gsad, gidx = gpm_pass(jorig, refp80[0], refp80[1],
                                  jnp.asarray(umv[0]), jnp.asarray(umv[1]),
                                  s=s, frame_w=w, frame_h=h, bd=bd)
            gsad = np.asarray(gsad).astype(np.int64)
            gidx = np.asarray(gidx)
            gbits = (4 + 2 * _bitlen_arr(umv[0][..., 0] >> 2)
                     + 2 * _bitlen_arr(umv[0][..., 1] >> 2)
                     + 2 * _bitlen_arr(umv[1][..., 0] >> 2)
                     + 2 * _bitlen_arr(umv[1][..., 1] >> 2))
            gcost = (gsad << 8) + lam * gbits + _bl(B.gpm_fp, lam)
            guse = gcost < cost
            cost = np.where(guse, gcost, cost)
            kind = np.where(guse, 3, kind).astype(np.int32)
            cflag = cflag & ~guse
            bwidx = np.where(guse, BCW_DEFAULT, bwidx)
            gval = np.where(guse, gidx + 1, 0).astype(np.int32)
        adm = np.where((kind == 4)[..., None], admv0,
                       np.where((kind == 5)[..., None], admv1, 0))
        size_data[s] = (cost, imode, kind, umv[0], umv[1], imrl, bwidx,
                        cflag, iisp, gval, adm)

    if mtt:
        from ..spec.decide import mtt_assemble_b
        dec = FrameDecisions.empty(h, w)
        rects = _rect_grids_inter(jbuf, jorig, refp80, memaps, lam, w, h,
                                  bd, tt=tt, B=B, planes=planes2)
        mtt_assemble_b(dec, size_data, rects, lam, ciip, affine, bcw, gpm,
                       B=B)
        return dec

    from ..spec.codec import FrameDecisions as FD
    dec = FD.empty(h, w)
    (c8, im8, k8, mva8, mvb8, mrl8a, bw8, cf8, isp8a, g8,
     adm8) = size_data[8]
    (c16, im16, k16, mva16, mvb16, mrl16a, bw16, cf16, isp16a, g16,
     adm16) = size_data[16]
    (c32, im32, k32, mva32, mvb32, mrl32a, bw32, cf32, isp32a, g32,
     adm32) = size_data[32]
    n16y, n16x = h // 16, w // 16
    n32y, n32x = h // 32, w // 32
    from ..spec.decide import _bl
    sum8 = (c8.reshape(n16y, 2, n16x, 2).sum(axis=(1, 3))
            + _bl(B.split_fp, lam))
    split16 = sum8 < c16
    cc16 = np.where(split16, sum8, c16)
    sum16 = (cc16.reshape(n32y, 2, n32x, 2).sum(axis=(1, 3))
             + _bl(B.split_fp, lam))
    split32 = sum16 < c32
    dec.split32[:] = split32.astype(np.uint8)
    dec.split16[:] = (split16
                      & np.kron(split32, np.ones((2, 2), bool))).astype(
                          np.uint8)

    def up(a, f):
        if a.ndim == 3:
            return np.kron(a, np.ones((f, f, 1), a.dtype))
        return np.kron(a, np.ones((f, f), a.dtype))

    use16 = up(split32.astype(np.uint8), 4).astype(bool)
    use8 = up(dec.split16, 2).astype(bool)

    def sel(a32, a16, a8):
        v = up(a32, 4)
        m16 = use16 if a32.ndim == 2 else use16[..., None]
        m8 = use8 if a32.ndim == 2 else use8[..., None]
        v = np.where(m16, up(a16, 2), v)
        return np.where(m8, a8, v)

    kind = sel(k32, k16, k8)
    mode = sel(im32, im16, im8)
    mrlv = sel(mrl32a, mrl16a, mrl8a)
    ispv = sel(isp32a, isp16a, isp8a)
    mv0 = sel(mva32, mva16, mva8)
    mv1 = sel(mvb32, mvb16, mvb8)
    itf = kind > 0
    dec.inter8[:] = itf.astype(np.uint8)
    dec.modes8[:] = np.where(itf, 0, mode)
    dec.mrl8[:] = np.where(itf, 0, mrlv).astype(np.uint8)
    dec.isp8[:] = np.where(itf, 0, ispv).astype(np.uint8)
    dirv = np.where(kind == 3, 2,
                    np.where((kind == 1) | (kind == 4), 0, 1))
    dec.dir8[:] = np.where(itf, dirv, 0).astype(np.uint8)
    use0 = itf & ((kind == 1) | (kind == 3) | (kind == 4))
    use1 = itf & ((kind == 2) | (kind == 3) | (kind == 5))
    dec.mv8[..., 0] = np.where(use0, mv0[..., 0], 0)
    dec.mv8[..., 1] = np.where(use0, mv0[..., 1], 0)
    dec.mv8_l1[..., 0] = np.where(use1, mv1[..., 0], 0)
    dec.mv8_l1[..., 1] = np.where(use1, mv1[..., 1], 0)
    if bcw:
        bw = sel(bw32, bw16, bw8)
        dec.bcw8[:] = np.where(itf & (kind == 3), bw,
                               BCW_DEFAULT).astype(np.uint8)
    if ciip:
        cf = sel(cf32.astype(np.uint8), cf16.astype(np.uint8),
                 cf8.astype(np.uint8))
        dec.ciip8[:] = np.where(itf, cf, 0).astype(np.uint8)
    if gpm:
        gv = sel(g32, g16, g8)
        dec.gpm8[:] = np.where(itf & (kind == 3), gv, 0).astype(np.uint8)
    if affine:
        dec.aff8[:] = (kind >= 4).astype(np.uint8)
        adm = sel(adm32, adm16, adm8)
        dec.admv8[:] = np.where((kind >= 4)[..., None], adm, 0)
    return dec
