"""JAX transforms + quantisation — device twin of spec/transform.py.

The forward/inverse DCT-II (and MTS DST-VII/DCT-VIII) are int32 matmuls
against the ROM matrices — the best-mapped workload on the TPU MXU
(SURVEY.md §2.9: "Transform SIMD -> MXU-native int matmul").  All shift/round
staging mirrors the spec model exactly; intermediate magnitudes are proven to
fit int32 (coefficients are 16-bit-clipped, |M| <= 91, N <= 64), and dequant
is restructured as a static net-shift with a pre-clip so no int64 is needed.

Functions operate on (..., h, w) batches with static (h, w).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom

COEFF_MIN, COEFF_MAX = -32768, 32767


def _log2(n: int) -> int:
    return int(n).bit_length() - 1


# precomputed eagerly: creating constants inside a trace and caching them
# would leak tracers across jit scopes
_MATS = {}
for _kind in (rom.DCT2, rom.DST7, rom.DCT8):
    for _n in rom.TR_SIZES:
        if _kind == rom.DCT2 or _n in rom.MTS_SIZES:
            _MATS[(_kind, _n)] = np.asarray(rom.tr_matrix(_kind, _n),
                                            np.int32)


def _mat(kind: int, n: int):
    return _MATS[(kind, n)]


def forward_transform(resi, h: int, w: int, kind_h: int = rom.DCT2,
                      kind_v: int = rom.DCT2, bd: int = 8):
    if kind_h == rom.IDT:     # transform skip (twin of spec IDT path)
        ts = rom.transform_shift(_log2(w), _log2(h), bd)
        return jnp.clip(resi.astype(jnp.int32) << ts, COEFF_MIN, COEFF_MAX)
    mh = _mat(kind_v, h)
    mw = _mat(kind_h, w)
    st1 = _log2(w) + bd - 9
    st2 = _log2(h) + 6
    x = resi.astype(jnp.int32)
    e = (jnp.matmul(x, mw.T, preferred_element_type=jnp.int32)
         + (1 << (st1 - 1))) >> st1
    c = (jnp.matmul(mh, e, preferred_element_type=jnp.int32)
         + (1 << (st2 - 1))) >> st2
    return jnp.clip(c, COEFF_MIN, COEFF_MAX)


def inverse_transform(coef, h: int, w: int, kind_h: int = rom.DCT2,
                      kind_v: int = rom.DCT2, bd: int = 8):
    if kind_h == rom.IDT:     # transform skip
        ts = rom.transform_shift(_log2(w), _log2(h), bd)
        c = coef.astype(jnp.int32)
        if ts > 0:
            c = (c + (1 << (ts - 1))) >> ts
        return jnp.clip(c, COEFF_MIN, COEFF_MAX)
    mh = _mat(kind_v, h)
    mw = _mat(kind_h, w)
    st2 = 20 - bd
    c = coef.astype(jnp.int32)
    e = (jnp.matmul(mh.T, c, preferred_element_type=jnp.int32) + 64) >> 7
    e = jnp.clip(e, COEFF_MIN, COEFF_MAX)
    x = (jnp.matmul(e, mw, preferred_element_type=jnp.int32)
         + (1 << (st2 - 1))) >> st2
    return jnp.clip(x, COEFF_MIN, COEFF_MAX)


_Q_SCALES = np.asarray(rom.QUANT_SCALES, np.int32)
_IQ_SCALES = np.asarray(rom.INV_QUANT_SCALES, np.int32)


def quantize(coef, h: int, w: int, qp, intra: bool = True, bd: int = 8,
             rdoq: bool = False, lam_rd=0, dq: bool = False):
    """qp may be a traced int32 scalar (shift amounts are data on TPU)."""
    if dq:
        if coef.ndim == 3:     # candidate-batched (C, h, w)
            return jax.vmap(
                lambda c: quantize_dq_j(c, h, w, qp, lam_rd, bd))(coef)
        return quantize_dq_j(coef, h, w, qp, lam_rd, bd)
    if rdoq:
        return quantize_rdoq_j(coef, h, w, qp, lam_rd, bd)
    qp = jnp.asarray(qp, jnp.int32)
    ts = rom.transform_shift(_log2(w), _log2(h), bd)
    q_bits = rom.QUANT_SHIFT + qp // 6 + ts
    scale = jnp.asarray(_Q_SCALES)[qp % 6]
    f = jnp.left_shift(jnp.int32(171 if intra else 85), q_bits - 9)
    c = coef.astype(jnp.int32)
    level = jnp.right_shift(jnp.abs(c) * scale + f, q_bits)
    level = jnp.clip(level, 0, COEFF_MAX)
    return jnp.sign(c) * level


def quantize_rdoq_j(coef, h: int, w: int, qp, lam_rd, bd: int = 8):
    """Device twin of spec quantize_rdoq (bit-identical int math).

    All in int32: the spec's int64 intermediates are bounded (err clipped
    to 2^15, lam*rate < 2^27) so int32 agrees exactly."""
    qp = jnp.asarray(qp, jnp.int32)
    ts = rom.transform_shift(_log2(w), _log2(h), bd)
    q_bits = rom.QUANT_SHIFT + qp // 6 + ts
    scale = jnp.asarray(_Q_SCALES)[qp % 6]
    dq_shift = bd + ((_log2(w) + _log2(h)) >> 1) - 9
    dq_scale = jnp.left_shift(jnp.asarray(_IQ_SCALES)[qp % 6], qp // 6)
    lam = jnp.minimum(jnp.left_shift(jnp.asarray(lam_rd, jnp.int32),
                                     jnp.int32(max(2 * ts, 0))),
                      1 << 25)

    c = coef.astype(jnp.int32)
    a = jnp.abs(c)
    # a * scale fits int64-on-device? a <= 2^15, scale <= 2^15 -> 2^30 ok
    l_a = jnp.clip(jnp.right_shift(a * scale, q_bits), 0, COEFF_MAX)
    l_b = jnp.clip(l_a + 1, 0, COEFF_MAX)

    def cost(lv):
        # lv*dq_scale: lv floor-quantized so lv*dq_scale ~ |coef| scale,
        # pre-clip keeps the product in range exactly as spec's int64 path
        # does via the final clip (values beyond clip never win the argmin)
        t = lv * dq_scale
        deq = jnp.clip(jnp.right_shift(t + (1 << (dq_shift - 1)), dq_shift),
                       COEFF_MIN, COEFF_MAX)
        err = jnp.minimum(jnp.abs(a - deq), 30000)
        # integer proxy kept deliberately — see spec quantize_rdoq note
        rate = jnp.where(lv > 0, 2 + 2 * _bitlen15_j(lv), 0)
        return err * err + lam * rate

    lev = jnp.where(cost(l_b) < cost(l_a), l_b, l_a)
    return jnp.sign(c) * lev


def _net_shift(t, net):
    """Exact (t << net) for net >= 0 (with saturation pre-clip) or rounded
    (t + 2^(|net|-1)) >> |net| for net < 0 — twin of the spec's int64
    (x * scale << per + round) >> shift staging."""
    netp = jnp.maximum(net, 0)
    netn = jnp.maximum(-net, 0)
    lim = jnp.left_shift(jnp.int32(1), 30 - netp)
    c_up = jnp.left_shift(jnp.clip(t, -lim, lim), netp)
    rnd = jnp.where(netn > 0, jnp.left_shift(jnp.int32(1),
                                             jnp.maximum(netn - 1, 0)), 0)
    c_dn = jnp.right_shift(t + rnd, netn)
    return jnp.where(net >= 0, c_up, c_dn)


def dequantize(level, h: int, w: int, qp, bd: int = 8, dq: bool = False):
    if dq:
        if level.ndim == 3:    # candidate-batched (C, h, w)
            return jax.vmap(
                lambda lv: dequantize_dq_j(lv, h, w, qp, bd))(level)
        return dequantize_dq_j(level, h, w, qp, bd)
    shift = bd + ((_log2(w) + _log2(h)) >> 1) - 9
    qp = jnp.asarray(qp, jnp.int32)
    per = qp // 6
    iq = jnp.asarray(_IQ_SCALES)[qp % 6]
    t = level.astype(jnp.int32) * iq          # |t| <= 32767*72 < 2^22
    c = _net_shift(t, per - shift)
    return jnp.clip(c, COEFF_MIN, COEFF_MAX)


def reconstruct(pred, level, h: int, w: int, qp: int,
                kind_h: int = rom.DCT2, kind_v: int = rom.DCT2, bd: int = 8,
                dq: bool = False):
    """Shared enc/dec reconstruction (zero levels reduce to pred exactly)."""
    resi = inverse_transform(dequantize(level, h, w, qp, bd, dq=dq), h, w,
                             kind_h, kind_v, bd)
    return jnp.clip(pred.astype(jnp.int32) + resi, 0, (1 << bd) - 1)


# ---------------------------------------------------------------------------
# Dependent quantization — device twins of spec/transform.py dq_states /
# dequantize_dq / quantize_dq.  The decoder-side state walk is an
# associative scan of 4-state transition maps (O(log n) depth on the VPU);
# the encoder trellis is a lax.scan Viterbi with int32 renormalised costs.
# ---------------------------------------------------------------------------
from ..spec.transform import DQ_MAPS  # noqa: E402

_SCAN_XY: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _scan_xy(log2w: int, log2h: int):
    """Walk-ordered (reverse diagonal scan) x/y index arrays (numpy)."""
    key = (log2w, log2h)
    if key not in _SCAN_XY:
        scan = rom.scan_order(log2w, log2h)
        xs = np.asarray([p[0] for p in scan], np.int32)[::-1].copy()
        ys = np.asarray([p[1] for p in scan], np.int32)[::-1].copy()
        _SCAN_XY[key] = (xs, ys)
    return _SCAN_XY[key]


def dq_states_j(level, h: int, w: int):
    """(h, w) int32 quantizer-state plane — twin of spec dq_states."""
    xs, ys = _scan_xy(_log2(w), _log2(h))
    par = (jnp.abs(level)[ys, xs] & 1).astype(jnp.int32)     # walk order
    maps = jnp.asarray(np.asarray(DQ_MAPS, np.int32))[par]   # (n, 4)

    def comb(a, b):      # compose: apply a (earlier) then b (later)
        return jnp.take_along_axis(b, a, axis=-1)

    cum = jax.lax.associative_scan(comb, maps, axis=0)
    st = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1, 0]])
    return jnp.zeros((h, w), jnp.int32).at[ys, xs].set(st)


def dequantize_dq_j(level, h: int, w: int, qp, bd: int = 8):
    shift = bd + ((_log2(w) + _log2(h)) >> 1) - 9
    qp = jnp.asarray(qp, jnp.int32)
    per = qp // 6
    iq = jnp.asarray(_IQ_SCALES)[qp % 6]
    st = dq_states_j(level, h, w)
    lv = level.astype(jnp.int32)
    off = ((st > 1) & (lv != 0)).astype(jnp.int32) * jnp.sign(lv)
    t = (2 * lv - off) * iq                   # |t| <= 65535*72 < 2^23
    c = _net_shift(t, per - (shift + 1))
    return jnp.clip(c, COEFF_MIN, COEFF_MAX)


def _dq_rate_j(lv):
    return jnp.where(lv > 0, 2 + 2 * _bitlen15_j(lv), 0)


def quantize_dq_j(coef, h: int, w: int, qp, lam_rd, bd: int = 8):
    """Trellis dependent quantization — bit-identical twin of spec
    quantize_dq (same candidate order, first-min tie-breaks, int32
    renormalised costs)."""
    from ..spec.transform import DQ_TRANS
    qp = jnp.asarray(qp, jnp.int32)
    ts = rom.transform_shift(_log2(w), _log2(h), bd)
    q_bits = rom.QUANT_SHIFT + qp // 6 + ts
    qscale = jnp.asarray(_Q_SCALES)[qp % 6]
    shift = bd + ((_log2(w) + _log2(h)) >> 1) - 9
    per = qp // 6
    iq = jnp.asarray(_IQ_SCALES)[qp % 6]
    lam = jnp.minimum(jnp.left_shift(jnp.asarray(lam_rd, jnp.int32),
                                     jnp.int32(max(2 * ts, 0))), 1 << 22)
    xs, ys = _scan_xy(_log2(w), _log2(h))
    c32 = coef.astype(jnp.int32)
    av = jnp.abs(c32)[ys, xs]                 # (n,) walk order

    def deq(l, q1):
        t = (2 * l - jnp.where(q1 & (l > 0), 1, 0)) * iq
        return jnp.clip(_net_shift(t, per - (shift + 1)),
                        COEFF_MIN, COEFF_MAX)

    trans = np.asarray(DQ_TRANS, np.int32)    # (4, 2)

    def step(cost, a):
        u = jnp.right_shift(a * qscale, q_bits - 1)
        cs, s2s, lvs, prevs = [], [], [], []
        for s in range(4):
            q1 = s > 1
            lf = jnp.minimum((u + 1) >> 1 if q1 else u >> 1,
                             COEFF_MAX - 1)
            for l in (jnp.int32(0), lf, lf + 1):
                d = jnp.minimum(jnp.abs(a - deq(l, jnp.bool_(q1))), 30000)
                cs.append(cost[s]
                          + jnp.right_shift(d * d + lam * _dq_rate_j(l), 4))
                s2s.append(jnp.asarray(trans[s])[l & 1])
                lvs.append(l)
                prevs.append(jnp.int32(s))
        c12 = jnp.stack(cs)
        s212 = jnp.stack(s2s)
        lv12 = jnp.stack(lvs)
        pr12 = jnp.stack(prevs)
        ncost, nbp, nlv = [], [], []
        for t in range(4):
            ct = jnp.where(s212 == t, c12, 1 << 30)
            i = jnp.argmin(ct)                # first-min, walk order
            ncost.append(ct[i])
            nbp.append(pr12[i])
            nlv.append(lv12[i])
        ncost = jnp.stack(ncost)
        m = ncost.min()
        return (jnp.minimum(ncost - m, 1 << 28),
                (jnp.stack(nbp), jnp.stack(nlv)))

    cost0 = jnp.asarray([0, 1 << 28, 1 << 28, 1 << 28], jnp.int32)
    cost, (bps, lvs) = jax.lax.scan(step, cost0, av)

    s_fin = jnp.argmin(cost).astype(jnp.int32)

    def back(s, blv):
        bp, lv = blv
        return bp[s], lv[s]

    _, out_lv = jax.lax.scan(back, s_fin, (bps, lvs), reverse=True)
    # out_lv[j] is the level chosen at walk step j (scan runs j = n-1..0,
    # outputs stored at their own index)
    signs = jnp.sign(c32)[ys, xs]
    return jnp.zeros((h, w), jnp.int32).at[ys, xs].set(
        jnp.where(signs < 0, -out_lv, out_lv))


# ---------------------------------------------------------------------------
# MTS candidate evaluation (device twin of spec/transform.choose_mts)
# ---------------------------------------------------------------------------
from ..spec.transform import MTS_IDX_BITS, MTS_SET  # noqa: E402


def _bitlen15_j(a):
    """Per-element bit length clamped to 15 == sum_k<15 (a >= 2^k) for
    0 <= a < 2^15 (levels are COEFF_MAX-clipped)."""
    return jnp.where(a > 0, 32 - jax.lax.clz(a.astype(jnp.int32)), 0)


def level_rate_est_j(lev, axes=None):
    """Integer rate proxy == spec level_rate_est (threshold-sum bitlen).

    axes: reduction axes (default: all) — pass (-2, -1) for
    candidate-batched (..., h, w) level stacks."""
    a = jnp.abs(lev)
    nnz = (a > 0).sum(axis=axes)
    bl = _bitlen15_j(a).sum(axis=axes)
    return (nnz + bl).astype(jnp.int32)


def level_rate_fp_j(lev, w, axes=None):
    """Fractional-bit (8.8) level rate — twin of spec level_rate_fp.
    w: (4,) int32 (w_nnz, w_ge2, w_ge4, w_dbl) from est.tx_tables_j."""
    a = jnp.abs(lev)
    nnz = (a > 0).sum(axis=axes).astype(jnp.int32)
    ge2 = (a >= 2).sum(axis=axes).astype(jnp.int32)
    ge4 = (a >= 4).sum(axis=axes).astype(jnp.int32)
    dbl = jnp.maximum(_bitlen15_j(a) - 3, 0).sum(axis=axes).astype(jnp.int32)
    return nnz * w[0] + ge2 * w[1] + ge4 * w[2] + dbl * w[3]


def _rd_cost_j(dist, rate_fp, lam):
    """Twin of spec _rd_cost: int32-safe lam * fractional-rate."""
    r = jnp.minimum(rate_fp, 1 << 22)
    return dist + lam * (r >> 8) + ((lam * (r & 255)) >> 8)


def choose_mts_j(resi, s: int, qp, lam_rd, bd: int = 8):
    """Returns (idx int32, levels (s,s), recon_resi (s,s)) — RD-selected
    transform pair, first-min tie-breaking in MTS_SET order."""
    midx, _, lev, rec = choose_tx_j(resi, s, qp, lam_rd, jnp.int32(0), bd,
                                    mts=True, lfnst=False)
    return midx, lev, rec


# ---------------------------------------------------------------------------
# LFNST (device twin of spec/transform fwd_lfnst/inv_lfnst/choose_tx)
# ---------------------------------------------------------------------------
from ..spec.transform import LFNST_IDX_BITS, tx_candidates  # noqa: E402

_LFNST_MATS = np.stack(
    [[rom.lfnst_matrix(si, ki) for ki in range(2)]
     for si in range(rom.LFNST_SETS)]).astype(np.int32)   # (4, 2, 16, 16)


def _lfnst_set_j(mode):
    """(set index int32, transpose bool) — twin of rom.lfnst_set_for_mode."""
    tr = mode > rom.DIA_IDX
    m = jnp.where(tr, 68 - mode, mode)
    s = jnp.where(mode <= rom.DC_IDX, 0,
                  jnp.where(m <= 12, 1, jnp.where(m <= 23, 2, 3)))
    return s.astype(jnp.int32), tr & (mode > rom.DC_IDX)


def fwd_lfnst_j(coef, kernel: int, mode):
    """Forward secondary transform; kernel = lfnst_idx - 1 (static)."""
    s_idx, tr = _lfnst_set_j(mode)
    m = jnp.asarray(_LFNST_MATS)[s_idx, kernel]
    sub = coef[:4, :4]
    sub = jnp.where(tr, sub.T, sub)
    t = (jnp.matmul(m, sub.reshape(16),
                    preferred_element_type=jnp.int32) + 64) >> 7
    out = jnp.zeros_like(coef)
    return out.at[:4, :4].set(
        jnp.clip(t, COEFF_MIN, COEFF_MAX).reshape(4, 4))


def inv_lfnst_j(coef, kernel: int, mode):
    s_idx, tr = _lfnst_set_j(mode)
    m = jnp.asarray(_LFNST_MATS)[s_idx, kernel]
    t = coef[:4, :4].reshape(16)
    v = (jnp.matmul(m.T, t, preferred_element_type=jnp.int32) + 64) >> 7
    sub = jnp.clip(v, COEFF_MIN, COEFF_MAX).reshape(4, 4)
    sub = jnp.where(tr, sub.T, sub)
    out = jnp.zeros_like(coef)
    return out.at[:4, :4].set(sub)


def inv_lfnst_switch_j(coef, lfnst_idx, mode):
    """Traced-index inverse LFNST (0 = identity)."""
    return jax.lax.switch(
        jnp.clip(lfnst_idx, 0, 2),
        [lambda: coef,
         lambda: inv_lfnst_j(coef, 0, mode),
         lambda: inv_lfnst_j(coef, 1, mode)])


# ---------------------------------------------------------------------------
# SBT (device twin of spec/transform choose_sbt / sbt_reconstruct)
# ---------------------------------------------------------------------------
from ..spec.transform import (SBT_IDX_BITS, sbt_kernels,  # noqa: E402
                              sbt_region)


def choose_sbt_j(resi, s: int, qp, lam_rd, bd: int = 8, rdoq: bool = False,
                 dq: bool = False):
    """(sbt_idx int32, levels_full, recon_resi) — RD over full DCT-II vs
    the 4 half transforms; twin of spec choose_sbt (first-min argmin,
    all-zero winner collapses to idx 0)."""
    from ..cabac import estimate as est
    _, _, sbt_fp, lvl_w = est.tx_tables_j(qp)
    costs, levs, recs = [], [], []
    for idx in range(5):
        x0, y0, w, h = sbt_region(idx, s)
        kh, kv = sbt_kernels(idx)
        sub = resi[y0:y0 + h, x0:x0 + w]
        coef = forward_transform(sub, h, w, kh, kv, bd)
        lev_s = quantize(coef, h, w, qp, intra=True, bd=bd, rdoq=rdoq,
                         lam_rd=lam_rd, dq=dq)
        lev = jnp.zeros((s, s), jnp.int32).at[y0:y0 + h,
                                              x0:x0 + w].set(lev_s)
        rec_s = inverse_transform(dequantize(lev_s, h, w, qp, bd, dq=dq),
                                  h, w, kh, kv, bd)
        rec = jnp.zeros((s, s), jnp.int32).at[y0:y0 + h,
                                              x0:x0 + w].set(rec_s)
        dist = ((resi - rec) ** 2).sum()
        rate_fp = level_rate_fp_j(lev, lvl_w) + sbt_fp[idx]
        costs.append(_rd_cost_j(dist, rate_fp, lam_rd))
        levs.append(lev)
        recs.append(rec)
    i = jnp.argmin(jnp.stack(costs)).astype(jnp.int32)
    lev = jnp.stack(levs)[i]
    rec = jnp.stack(recs)[i]
    i = jnp.where(lev.any(), i, 0).astype(jnp.int32)
    return i, lev, rec


def sbt_resi_j(lev_full, sbt_idx, s: int, qp, bd: int = 8,
               dq: bool = False):
    """Traced-index SBT residual: dequant + inverse-transform the sub-area
    per sbt_idx (0 = full DCT-II) — twin of spec sbt_reconstruct."""
    def br(idx):
        def f():
            x0, y0, w, h = sbt_region(idx, s)
            kh, kv = sbt_kernels(idx)
            sub = lev_full[y0:y0 + h, x0:x0 + w]
            r = inverse_transform(dequantize(sub, h, w, qp, bd, dq=dq),
                                  h, w, kh, kv, bd)
            return jnp.zeros((s, s), jnp.int32).at[y0:y0 + h,
                                                   x0:x0 + w].set(r)
        return f
    return jax.lax.switch(jnp.clip(sbt_idx, 0, 4), [br(i) for i in range(5)])


_TX_CONST: dict[tuple, tuple] = {}


def _tx_const(cands: tuple, s: int):
    """Per-candidate constant matrix stacks (primary kernels; LFNST
    candidates ride the DCT2 primaries).  TS (mk=5) slots get DCT2
    matrices — their results are overwritten by the dedicated TS chain."""
    key = (cands, s)
    if key not in _TX_CONST:
        mh, mw = [], []
        for mk, lk in cands:
            kh, kv = MTS_SET[0 if mk == 5 else mk]
            mh.append(_mat(kv, s))
            mw.append(_mat(kh, s))
        _TX_CONST[key] = (np.stack(mh), np.stack(mw))
    return _TX_CONST[key]


def choose_tx_j(resi, s: int, qp, lam_rd, mode, bd: int = 8,
                mts: bool = True, lfnst: bool = False, rdoq: bool = False,
                allow=None, ts: bool = False, dq: bool = False):
    """Joint MTS/LFNST RD selection — twin of spec choose_tx.

    Candidate-BATCHED: all primary transforms run as one stacked int32
    matmul pair, quant/dequant/rate are elementwise over the candidate
    axis, so the op count is O(1) in the candidate count (the op-count of
    the per-leaf scan step is the phase-B bottleneck on TPU).  Identical
    integer arithmetic to the unrolled form: first-min tie-breaking in
    tx_candidates order.  ``allow`` (traced bool, optional) masks all
    non-DCT2 candidates when False — used for MIP leaves, whose spec path
    bypasses choose_tx entirely (candidate (0,0) computes the identical
    plain quantize, so levels match bit-for-bit)."""
    cands = tuple(tx_candidates(mts, lfnst, ts))
    C = len(cands)
    mks = np.asarray([mk for mk, _ in cands], np.int32)
    lks = np.asarray([lk for _, lk in cands], np.int32)
    mh_stack, mw_stack = _tx_const(cands, s)

    # forward primaries, batched (twin of forward_transform staging)
    st1 = _log2(s) + bd - 9
    st2 = _log2(s) + 6
    x = resi.astype(jnp.int32)
    e = (jnp.matmul(jnp.broadcast_to(x, (C, s, s)),
                    jnp.asarray(mw_stack.transpose(0, 2, 1)),
                    preferred_element_type=jnp.int32)
         + (1 << (st1 - 1))) >> st1
    coef = (jnp.matmul(jnp.asarray(mh_stack), e,
                       preferred_element_type=jnp.int32)
            + (1 << (st2 - 1))) >> st2
    coef = jnp.clip(coef, COEFF_MIN, COEFF_MAX)

    # LFNST candidates: secondary transform of the DCT2 coef's 4x4 corner
    if lks.any():
        s_idx, tr = _lfnst_set_j(mode)
        kmats = jnp.asarray(_LFNST_MATS)[s_idx]          # (2, 16, 16)
        kc = kmats[jnp.asarray(np.maximum(lks - 1, 0))]  # (C, 16, 16)
        sub = coef[:, :4, :4]
        sub = jnp.where(tr, sub.transpose(0, 2, 1), sub)
        t = jnp.matmul(kc, sub.reshape(C, 16, 1),
                       preferred_element_type=jnp.int32)
        lf = jnp.clip((t.reshape(C, 4, 4) + (1 << 6)) >> 7,
                      COEFF_MIN, COEFF_MAX)
        lf_full = jnp.zeros_like(coef).at[:, :4, :4].set(lf)
        lmask = jnp.asarray(lks > 0)[:, None, None]
        coef = jnp.where(lmask, lf_full, coef)

    # TS candidate: pure shift chain overwrites its slot
    ts_pos = int(np.flatnonzero(mks == 5)[0]) if ts else -1
    if ts:
        tsh = rom.transform_shift(_log2(s), _log2(s), bd)
        coef = coef.at[ts_pos].set(
            jnp.clip(x << tsh, COEFF_MIN, COEFF_MAX))

    lev = quantize(coef, s, s, qp, intra=True, bd=bd, rdoq=rdoq,
                   lam_rd=lam_rd, dq=dq)
    dqc = dequantize(lev, s, s, qp, bd, dq=dq)

    if lks.any():
        s_idx, tr = _lfnst_set_j(mode)
        kmats = jnp.asarray(_LFNST_MATS)[s_idx]
        kc = kmats[jnp.asarray(np.maximum(lks - 1, 0))]
        t = dqc[:, :4, :4].reshape(C, 16, 1)
        v = jnp.matmul(kc.transpose(0, 2, 1), t,
                       preferred_element_type=jnp.int32)
        sub = jnp.clip((v.reshape(C, 4, 4) + (1 << 6)) >> 7,
                       COEFF_MIN, COEFF_MAX)
        sub = jnp.where(tr, sub.transpose(0, 2, 1), sub)
        inv_full = jnp.zeros_like(dqc).at[:, :4, :4].set(sub)
        lmask = jnp.asarray(lks > 0)[:, None, None]
        dqc = jnp.where(lmask, inv_full, dqc)

    # inverse primaries, batched (twin of inverse_transform staging)
    st2i = 20 - bd
    ei = (jnp.matmul(jnp.asarray(mh_stack.transpose(0, 2, 1)), dqc,
                     preferred_element_type=jnp.int32) + 64) >> 7
    ei = jnp.clip(ei, COEFF_MIN, COEFF_MAX)
    rec = (jnp.matmul(ei, jnp.asarray(mw_stack),
                      preferred_element_type=jnp.int32)
           + (1 << (st2i - 1))) >> st2i
    rec = jnp.clip(rec, COEFF_MIN, COEFF_MAX)
    if ts:
        tsh = rom.transform_shift(_log2(s), _log2(s), bd)
        cts = dqc[ts_pos]
        if tsh > 0:
            cts = (cts + (1 << (tsh - 1))) >> tsh
        rec = rec.at[ts_pos].set(jnp.clip(cts, COEFF_MIN, COEFF_MAX))

    dist = ((resi[None] - rec) ** 2).sum(axis=(-2, -1))
    from ..cabac import estimate as est
    mts_fp, lfnst_fp, _, lvl_w = est.tx_tables_j(qp)
    midx = jnp.asarray(np.asarray([mk for mk, _ in cands], np.int32))
    lidx = jnp.asarray(np.asarray([lk for _, lk in cands], np.int32))
    use_l = np.asarray([1 if (lfnst and mk == 0) else 0
                        for mk, lk in cands], np.int32)
    bits_fp = ((mts_fp[midx] if (mts or ts) else jnp.int32(0))
               + jnp.where(jnp.asarray(use_l) > 0, lfnst_fp[lidx], 0))
    rate_fp = level_rate_fp_j(lev, lvl_w, axes=(-2, -1)) + bits_fp
    base = _rd_cost_j(dist, rate_fp, lam_rd)
    pen = np.asarray([(mk, lk) != (0, 0) for mk, lk in cands])
    # penalty semantics: 'allow' False masks non-DCT2; otherwise no penalty
    if allow is None:
        costs = base
    else:
        costs = (base
                 + jnp.where(jnp.asarray(pen),
                             jnp.where(jnp.asarray(allow), jnp.int32(0),
                                       jnp.int32(1 << 29)),
                             jnp.int32(0)))
    idx = jnp.argmin(costs).astype(jnp.int32)
    return (jnp.asarray(mks)[idx], jnp.asarray(lks)[idx], lev[idx],
            rec[idx])
