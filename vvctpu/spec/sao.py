"""Sample Adaptive Offset — stats, per-CTU RD decision, filter, syntax.

Role of VTM:CommonLib/SampleAdaptiveOffset.cpp (offsetCTU/SAOProcess) and
VTM:EncoderLib/EncSampleAdaptiveOffset.cpp (statistics gathering +
deriveParametersCTU RD estimation).  Types: band offset (4 consecutive of 32
bands) and 4-direction edge offset with the classic 2+sign(p-n1)+sign(p-n2)
categoriser; offsets clipped to +-7 (8-bit).

Placement note (internal-format choice, documented): SAO parameters are coded
in a slice-tail section after the CTU tree data, because this encoder derives
them after the frame is reconstructed and deblocked — the same two-pass
ordering VTM uses internally (compressSlice then encodeSlice, SURVEY.md
§3.1); only the bitstream position differs from the standard's per-CTU
interleave.

Everything here is vectorised numpy shared verbatim by the spec and JAX
pipelines, so enc/dec recon match is by construction.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..cabac import contexts as C

SAO_OFF, SAO_BAND, SAO_EO0, SAO_EO90, SAO_EO135, SAO_EO45 = range(6)
N_BANDS = 32
MAX_OFFSET = 7

_EO_NEIGH = {
    SAO_EO0: ((0, -1), (0, 1)),      # (dy, dx) pairs: horizontal
    SAO_EO90: ((-1, 0), (1, 0)),
    SAO_EO135: ((-1, -1), (1, 1)),
    SAO_EO45: ((-1, 1), (1, -1)),
}
# edge categories: edgeIdx = 2 + sign(p-n1) + sign(p-n2); offsets apply to
# edgeIdx 0,1,3,4 with implicit signs +,+,-,-
_EO_SIGN = np.array([1, 1, 0, -1, -1], np.int64)


@dataclass
class SaoParams:
    """Per-CTU, per-component params (padded-frame CTU grid)."""
    type: np.ndarray        # (nY, nX, 3) int32
    offsets: np.ndarray     # (nY, nX, 3, 4) int32 (unsigned magnitudes)
    band_pos: np.ndarray    # (nY, nX, 3) int32

    @classmethod
    def empty(cls, n_y: int, n_x: int) -> "SaoParams":
        return cls(np.zeros((n_y, n_x, 3), np.int32),
                   np.zeros((n_y, n_x, 3, 4), np.int32),
                   np.zeros((n_y, n_x, 3), np.int32))

    def equal(self, o: "SaoParams") -> bool:
        return (np.array_equal(self.type, o.type)
                and np.array_equal(self.offsets, o.offsets)
                and np.array_equal(self.band_pos, o.band_pos))


def _edge_categories(p: np.ndarray, t: int) -> np.ndarray:
    """edgeIdx plane (borders category 2 = neutral)."""
    (dy1, dx1), (dy2, dx2) = _EO_NEIGH[t]
    h, w = p.shape
    z = np.pad(p, 1, mode="edge").astype(np.int64)
    n1 = z[1 + dy1:1 + dy1 + h, 1 + dx1:1 + dx1 + w]
    n2 = z[1 + dy2:1 + dy2 + h, 1 + dx2:1 + dx2 + w]
    cat = 2 + np.sign(p - n1) + np.sign(p - n2)
    # neutralise frame borders that lack a true neighbour
    if dy1 != 0 or dy2 != 0:
        cat[0, :] = 2
        cat[-1, :] = 2
    if dx1 != 0 or dx2 != 0:
        cat[:, 0] = 2
        cat[:, -1] = 2
    return cat.astype(np.int64)


def _apply_component(rec: np.ndarray, orig_unused, params: SaoParams,
                     comp: int, ctu: int, bd: int) -> np.ndarray:
    h, w = rec.shape
    scale = 1 if comp == 0 else 2
    cs = ctu // scale
    out = rec.astype(np.int64)
    mx = (1 << bd) - 1
    n_y, n_x = params.type.shape[:2]
    # precompute edge category planes once per used type
    cat_planes = {}
    for t in range(SAO_EO0, SAO_EO45 + 1):
        if (params.type[:, :, comp] == t).any():
            cat_planes[t] = _edge_categories(out, t)
    band_idx = out >> (bd - 5)
    for cy in range(n_y):
        for cx in range(n_x):
            t = int(params.type[cy, cx, comp])
            if t == SAO_OFF:
                continue
            sl = np.s_[cy * cs:(cy + 1) * cs, cx * cs:(cx + 1) * cs]
            offs = params.offsets[cy, cx, comp].astype(np.int64)
            if t == SAO_BAND:
                bp = int(params.band_pos[cy, cx, comp])
                rel = (band_idx[sl] - bp) % N_BANDS
                add = np.where(rel < 4, offs[np.minimum(rel, 3)], 0)
                # band offsets carry explicit signs in `offsets`
                out[sl] = np.clip(out[sl] + add, 0, mx)
            else:
                cat = cat_planes[t][sl]
                lut = np.zeros(5, np.int64)
                lut[[0, 1, 3, 4]] = offs * _EO_SIGN[[0, 1, 3, 4]]
                out[sl] = np.clip(out[sl] + lut[cat], 0, mx)
    return out.astype(np.int32)


def apply_sao(planes, params: SaoParams, ctu: int = 64, bd: int = 8):
    return [_apply_component(planes[c], None, params, c, ctu, bd)
            for c in range(3)]


# ---------------------------------------------------------------------------
# encoder: statistics + decision
# ---------------------------------------------------------------------------

def _ctu_view(plane: np.ndarray, cy: int, cx: int, cs: int) -> np.ndarray:
    return plane[cy * cs:(cy + 1) * cs, cx * cs:(cx + 1) * cs]


def decide_sao(orig_planes, rec_planes, qp: int, ctu: int = 64,
               bd: int = 8) -> SaoParams:
    """Pick per-CTU params minimising D + lambda*R (integer costs)."""
    h, w = rec_planes[0].shape
    n_y, n_x = h // ctu, w // ctu
    params = SaoParams.empty(n_y, n_x)
    lam = int(round(0.57 * (2.0 ** ((qp - 12) / 3.0)) * 256.0))
    bits_est = {"off": 2, "edge": 20, "band": 28}

    for comp in range(3):
        rec = rec_planes[comp].astype(np.int64)
        org = orig_planes[comp].astype(np.int64)
        diff = org - rec
        scale = 1 if comp == 0 else 2
        cs = ctu // scale
        cats = {t: _edge_categories(rec, t)
                for t in range(SAO_EO0, SAO_EO45 + 1)}
        band_idx = rec >> (bd - 5)
        for cy in range(n_y):
            for cx in range(n_x):
                d = _ctu_view(diff, cy, cx, cs)
                best_cost = bits_est["off"] * lam
                best = (SAO_OFF, np.zeros(4, np.int64), 0)
                # edge types
                for t in range(SAO_EO0, SAO_EO45 + 1):
                    cat = _ctu_view(cats[t], cy, cx, cs)
                    offs = np.zeros(4, np.int64)
                    d_delta = 0
                    for oi, ci in enumerate((0, 1, 3, 4)):
                        m = cat == ci
                        n = int(m.sum())
                        if n == 0:
                            continue
                        e = int(d[m].sum()) * int(_EO_SIGN[ci])
                        o = max(0, min(MAX_OFFSET,
                                       int(round(e / n)) if n else 0))
                        # refine: integer o minimising n*o^2 - 2*o*e
                        while o > 0 and n * o * o - 2 * o * e > \
                                n * (o - 1) * (o - 1) - 2 * (o - 1) * e:
                            o -= 1
                        offs[oi] = o
                        d_delta += n * o * o - 2 * o * e
                    cost = d_delta * 256 + bits_est["edge"] * lam
                    if cost < best_cost:
                        best_cost = cost
                        best = (t, offs, 0)
                # band type
                bi = _ctu_view(band_idx, cy, cx, cs)
                n_b = np.bincount(bi.ravel(), minlength=N_BANDS)
                e_b = np.bincount(bi.ravel(), weights=d.ravel(),
                                  minlength=N_BANDS).astype(np.int64)
                o_b = np.zeros(N_BANDS, np.int64)
                nz = n_b > 0
                o_b[nz] = np.clip(np.round(e_b[nz] / n_b[nz]), -MAX_OFFSET,
                                  MAX_OFFSET).astype(np.int64)
                dd_b = n_b * o_b * o_b - 2 * o_b * e_b
                # best window of 4 consecutive bands
                win = np.array([dd_b[(np.arange(4) + s) % N_BANDS].sum()
                                for s in range(N_BANDS)])
                s_best = int(np.argmin(win))
                cost = int(win[s_best]) * 256 + bits_est["band"] * lam
                if cost < best_cost:
                    best_cost = cost
                    best = (SAO_BAND,
                            o_b[(np.arange(4) + s_best) % N_BANDS], s_best)
                params.type[cy, cx, comp] = best[0]
                params.offsets[cy, cx, comp] = best[1]
                params.band_pos[cy, cx, comp] = best[2]
    return params


# ---------------------------------------------------------------------------
# syntax (slice-tail section), direction-agnostic io
# ---------------------------------------------------------------------------

def code_sao_params(io, params: SaoParams | None, n_y: int,
                    n_x: int) -> SaoParams:
    out = params if params is not None else SaoParams.empty(n_y, n_x)
    dec = io.decoding
    for cy in range(n_y):
        for cx in range(n_x):
            for comp in range(3):
                t = None if dec else int(out.type[cy, cx, comp])
                on = io.bin(C.SAO_TYPE(0), None if dec else int(t != 0))
                if not on:
                    if dec:
                        out.type[cy, cx, comp] = SAO_OFF
                    continue
                is_band = io.byp(None if dec else int(t == SAO_BAND))
                if is_band:
                    bp = io.byp_n(None if dec else
                                  int(out.band_pos[cy, cx, comp]), 5)
                    if dec:
                        out.type[cy, cx, comp] = SAO_BAND
                        out.band_pos[cy, cx, comp] = bp
                    for i in range(4):
                        mag = _tu_byp(io, None if dec else
                                      abs(int(out.offsets[cy, cx, comp, i])))
                        if mag:
                            sign = io.byp(None if dec else
                                          int(out.offsets[cy, cx, comp, i]
                                              < 0))
                        else:
                            sign = 0
                        if dec:
                            out.offsets[cy, cx, comp, i] = -mag if sign \
                                else mag
                else:
                    et = io.byp_n(None if dec else t - SAO_EO0, 2)
                    if dec:
                        out.type[cy, cx, comp] = SAO_EO0 + et
                    for i in range(4):
                        mag = _tu_byp(io, None if dec else
                                      int(out.offsets[cy, cx, comp, i]))
                        if dec:
                            out.offsets[cy, cx, comp, i] = mag
    return out


def _tu_byp(io, val, cmax: int = MAX_OFFSET):
    """Truncated-unary bypass magnitude."""
    if io.decoding:
        v = 0
        while v < cmax and io.byp():
            v += 1
        return v
    v = int(val)
    for _ in range(v):
        io.byp(1)
    if v < cmax:
        io.byp(0)
    return v
