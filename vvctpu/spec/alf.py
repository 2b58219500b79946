"""Adaptive loop filter — Wiener-derived 7x7 diamond, CTU on/off flags.

Role of VTM:CommonLib/AdaptiveLoopFilter.cpp + EncoderLib/
EncAdaptiveLoopFilter.cpp (SURVEY.md §2.5): the encoder derives filter
coefficients by least squares against the source (covariance accumulation +
solve), signals them in the slice-tail section, and decides per-CTU on/off
by SSE; the decoder applies the parsed filter identically.

Round-1 simplifications (documented; structure matches the reference's):
single filter class (no 25-class gradient classification yet), luma only,
difference-form linear taps (no clipping nonlinearity).  The filter is
DC-neutral by construction: out = p + (sum c_i * (p_i + p_mirror_i - 2p)
+ 64) >> 7, so only the 12 symmetric tap weights are signalled.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..cabac import contexts as C

# 7x7 diamond: 12 symmetric (dy, dx) offset pairs (mirror is implicit)
DIAMOND = [(-3, 0), (-2, -1), (-2, 0), (-2, 1), (-1, -2), (-1, -1),
           (-1, 0), (-1, 1), (-1, 2), (0, -3), (0, -2), (0, -1)]
N_COEFF = len(DIAMOND)
COEFF_MAX = 1023          # 10-bit signed, scale 128 = 1.0


@dataclass
class AlfParams:
    enabled: bool = False
    coeff: np.ndarray = field(
        default_factory=lambda: np.zeros(N_COEFF, np.int32))
    ctu_on: np.ndarray = None      # (nY, nX) uint8

    def equal(self, o: "AlfParams") -> bool:
        return (self.enabled == o.enabled
                and np.array_equal(self.coeff, o.coeff)
                and (not self.enabled
                     or np.array_equal(self.ctu_on, o.ctu_on)))


def _features(plane: np.ndarray) -> np.ndarray:
    """(12, H, W) int64 difference features (p_i + p_-i - 2p)."""
    p = plane.astype(np.int64)
    z = np.pad(p, 3, mode="edge")
    h, w = p.shape
    out = np.empty((N_COEFF, h, w), np.int64)
    for i, (dy, dx) in enumerate(DIAMOND):
        a = z[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
        b = z[3 - dy:3 - dy + h, 3 - dx:3 - dx + w]
        out[i] = a + b - 2 * p
    return out


def apply_alf(plane: np.ndarray, params: AlfParams, ctu: int = 64,
              bd: int = 8) -> np.ndarray:
    """Filter the luma plane with per-CTU on/off (shared enc/dec)."""
    if not params.enabled:
        return plane
    f = _features(plane)
    c = params.coeff.astype(np.int64)
    delta = (np.tensordot(c, f, axes=(0, 0)) + 64) >> 7
    filtered = np.clip(plane.astype(np.int64) + delta, 0, (1 << bd) - 1)
    h, w = plane.shape
    on = np.kron(params.ctu_on.astype(bool),
                 np.ones((ctu, ctu), bool))[:h, :w]
    return np.where(on, filtered, plane).astype(np.int32)


def derive_alf(orig: np.ndarray, rec: np.ndarray, qp: int, ctu: int = 64,
               bd: int = 8) -> AlfParams:
    """Wiener solve + integer quantisation + per-CTU RD on/off."""
    h, w = rec.shape
    n_y, n_x = h // ctu, w // ctu
    params = AlfParams(ctu_on=np.zeros((n_y, n_x), np.uint8))
    f = _features(rec)
    err = (orig.astype(np.int64) - rec).reshape(-1).astype(np.float64)
    fm = f.reshape(N_COEFF, -1).astype(np.float64)
    gram = fm @ fm.T
    rhs = fm @ err
    # ridge for numerical safety on flat content
    gram += np.eye(N_COEFF) * (1.0 + gram.trace() * 1e-9)
    sol = np.linalg.solve(gram, rhs)
    coeff = np.clip(np.round(sol * 128.0), -COEFF_MAX, COEFF_MAX)
    coeff = coeff.astype(np.int32)
    if not coeff.any():
        return params
    params.coeff = coeff
    params.enabled = True
    # per-CTU decision by SSE (+ small lambda * flag bit)
    delta = (np.tensordot(coeff.astype(np.int64), f, axes=(0, 0)) + 64) >> 7
    filt = np.clip(rec.astype(np.int64) + delta, 0, (1 << bd) - 1)
    e_off = ((orig.astype(np.int64) - rec) ** 2)
    e_on = ((orig.astype(np.int64) - filt) ** 2)
    lam = max(1, int(round(0.57 * 2.0 ** ((qp - 12) / 3.0))))
    for cy in range(n_y):
        for cx in range(n_x):
            sl = np.s_[cy * ctu:(cy + 1) * ctu, cx * ctu:(cx + 1) * ctu]
            gain = int(e_off[sl].sum()) - int(e_on[sl].sum())
            params.ctu_on[cy, cx] = 1 if gain > lam else 0
    if not params.ctu_on.any():
        params.enabled = False
    return params


# ---------------------------------------------------------------------------
# syntax (slice-tail section after SAO), direction-agnostic io
# ---------------------------------------------------------------------------

def _eg3(io, v):
    """Signed EG(3) bypass code for coefficients."""
    if io.decoding:
        sym = 0
        k = 3
        while io.byp():
            sym += 1 << k
            k += 1
        sym += io.byp_n(n=k) if k else 0
        if sym == 0:
            return 0
        sign = io.byp()
        return -sym if sign else sym
    a = abs(int(v))
    sym = a
    k = 3
    while sym >= (1 << k):
        io.byp(1)
        sym -= 1 << k
        k += 1
    io.byp(0)
    if k:
        io.byp_n(sym, k)
    if a:
        io.byp(int(v < 0))
    return v


def code_alf_params(io, params: AlfParams | None, n_y: int,
                    n_x: int) -> AlfParams:
    out = params if params is not None else AlfParams(
        ctu_on=np.zeros((n_y, n_x), np.uint8))
    dec = io.decoding
    on = io.bin(C.ALF_CTB_FLAG(0), None if dec else int(out.enabled))
    if dec:
        out.enabled = bool(on)
    if not on:
        return out
    for i in range(N_COEFF):
        v = _eg3(io, None if dec else int(out.coeff[i]))
        if dec:
            out.coeff[i] = v
    for cy in range(n_y):
        for cx in range(n_x):
            b = io.bin(C.ALF_CTB_FLAG(1),
                       None if dec else int(out.ctu_on[cy, cx]))
            if dec:
                out.ctu_on[cy, cx] = b
    return out
