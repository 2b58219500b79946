"""Spec-model inter prediction: MC interpolation, MV prediction, ME.

Role of VTM:CommonLib/InterPrediction.cpp (motionCompensation, xPredInterBlk)
+ InterpolationFilter.cpp (8-tap luma / 4-tap chroma separable FIR) and the
encoder side VTM:EncoderLib/InterSearch.cpp (xMotionEstimation), redesigned
batched (SURVEY.md §2.9/§7.2 stage 4): integer full-search SAD over a dense
candidate window instead of TZSearch's sequential early-out pattern.

MV convention: 1/16-pel luma units (VVC storage precision); chroma derives
the same numeric MV interpreted on the 1/32 grid of the half-res plane.
Interpolation staging (8-bit): horizontal pass unshifted (64-weighted),
vertical pass (sum + 2048) >> 12; single-direction pass (sum + 32) >> 6.
"""
from __future__ import annotations

import numpy as np

from ..core import rom

MV_FRAC_BITS = 4                 # 1/16 pel
REF_MARGIN = 80


def pad_reference(plane: np.ndarray, margin: int = REF_MARGIN) -> np.ndarray:
    return np.pad(plane, margin, mode="edge")


def mc_luma(ref_pad: np.ndarray, x: int, y: int, w: int, h: int,
            mvx: int, mvy: int, bd: int = 8,
            margin: int = REF_MARGIN) -> np.ndarray:
    """Motion-compensated (h, w) luma block; mv in 1/16 pel."""
    taps = rom.mc_filter_luma().astype(np.int64)
    ix, fx = (mvx >> MV_FRAC_BITS), mvx & 15
    iy, fy = (mvy >> MV_FRAC_BITS), mvy & 15
    x0 = x + ix + margin
    y0 = y + iy + margin
    mx = (1 << bd) - 1
    if fx == 0 and fy == 0:
        return ref_pad[y0:y0 + h, x0:x0 + w].astype(np.int32)
    if fy == 0:
        win = ref_pad[y0:y0 + h, x0 - 3:x0 + w + 4].astype(np.int64)
        acc = np.zeros((h, w), np.int64)
        for t in range(8):
            acc += taps[fx, t] * win[:, t:t + w]
        return np.clip((acc + 32) >> 6, 0, mx).astype(np.int32)
    if fx == 0:
        win = ref_pad[y0 - 3:y0 + h + 4, x0:x0 + w].astype(np.int64)
        acc = np.zeros((h, w), np.int64)
        for t in range(8):
            acc += taps[fy, t] * win[t:t + h, :]
        return np.clip((acc + 32) >> 6, 0, mx).astype(np.int32)
    win = ref_pad[y0 - 3:y0 + h + 4, x0 - 3:x0 + w + 4].astype(np.int64)
    tmp = np.zeros((h + 7, w), np.int64)
    for t in range(8):
        tmp += taps[fx, t] * win[:, t:t + w]
    acc = np.zeros((h, w), np.int64)
    for t in range(8):
        acc += taps[fy, t] * tmp[t:t + h, :]
    return np.clip((acc + 2048) >> 12, 0, mx).astype(np.int32)


def mc_chroma(ref_pad: np.ndarray, x: int, y: int, w: int, h: int,
              mvx: int, mvy: int, bd: int = 8,
              margin: int = REF_MARGIN) -> np.ndarray:
    """Chroma MC: coords on the half-res plane, mv numerically equal to the
    luma MV -> 1/32-pel phases."""
    taps = rom.mc_filter_chroma().astype(np.int64)
    ix, fx = (mvx >> 5), mvx & 31
    iy, fy = (mvy >> 5), mvy & 31
    x0 = x + ix + margin
    y0 = y + iy + margin
    mx = (1 << bd) - 1
    if fx == 0 and fy == 0:
        return ref_pad[y0:y0 + h, x0:x0 + w].astype(np.int32)
    if fy == 0:
        win = ref_pad[y0:y0 + h, x0 - 1:x0 + w + 2].astype(np.int64)
        acc = sum(taps[fx, t] * win[:, t:t + w] for t in range(4))
        return np.clip((acc + 32) >> 6, 0, mx).astype(np.int32)
    if fx == 0:
        win = ref_pad[y0 - 1:y0 + h + 2, x0:x0 + w].astype(np.int64)
        acc = sum(taps[fy, t] * win[t:t + h, :] for t in range(4))
        return np.clip((acc + 32) >> 6, 0, mx).astype(np.int32)
    win = ref_pad[y0 - 1:y0 + h + 2, x0 - 1:x0 + w + 2].astype(np.int64)
    tmp = sum(taps[fx, t] * win[:, t:t + w] for t in range(4))
    acc = sum(taps[fy, t] * tmp[t:t + h, :] for t in range(4))
    return np.clip((acc + 2048) >> 12, 0, mx).astype(np.int32)


def clip_mv(mvx: int, mvy: int, x: int, y: int, s: int, frame_w: int,
            frame_h: int, margin: int = REF_MARGIN):
    """Keep the full 8-tap filter footprint inside the padded reference."""
    def clip1(mv, pos, n):
        lo = -((pos + margin - 8) << MV_FRAC_BITS)
        hi = (n - pos - s + margin - 8) << MV_FRAC_BITS
        return max(lo, min(hi, mv))

    return clip1(mvx, x, frame_w), clip1(mvy, y, frame_h)


# ---------------------------------------------------------------------------
# MV prediction (simple deterministic 2-candidate AMVP; doc'd subset of
# VTM:CommonLib/UnitTools.cpp PU::getInterMVPCandidates)
# ---------------------------------------------------------------------------

def mvp_candidates(mv_map: np.ndarray, inter_map: np.ndarray, x: int, y: int,
                   s: int):
    """mv_map: (H//8, W//8, 2); inter_map: (H//8, W//8) bool.
    Candidates: left neighbour, above neighbour, zero (first two distinct)."""
    cands = []
    gh, gw = inter_map.shape

    def add(gx, gy):
        if 0 <= gx < gw and 0 <= gy < gh and inter_map[gy, gx]:
            mv = (int(mv_map[gy, gx, 0]), int(mv_map[gy, gx, 1]))
            if mv not in cands:
                cands.append(mv)

    add((x - 1) // 8, (y + s - 1) // 8)      # left
    add((x + s - 1) // 8, (y - 1) // 8)      # above
    add((x - 1) // 8, (y - 1) // 8)          # above-left
    while len(cands) < 2:
        if (0, 0) not in cands:
            cands.append((0, 0))
        else:
            cands.append((0, 0))
            break
    return cands[:2]


# ---------------------------------------------------------------------------
# Integer motion estimation (encoder policy; numpy twin of coding/me.py)
# ---------------------------------------------------------------------------
ME_RANGE = 16   # +- integer-pel search window


def me_block_sads(orig: np.ndarray, ref: np.ndarray, x: int, y: int,
                  s: int) -> np.ndarray:
    """(2R+1, 2R+1) int64 SAD map over integer offsets (dy, dx); candidates
    outside the frame use edge-padded reference samples."""
    r = ME_RANGE
    blk = orig[y:y + s, x:x + s].astype(np.int64)
    refp = np.pad(ref, r, mode="edge").astype(np.int64)
    sads = np.empty((2 * r + 1, 2 * r + 1), np.int64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            win = refp[y + dy + r:y + dy + r + s, x + dx + r:x + dx + r + s]
            sads[dy + r, dx + r] = np.abs(blk - win).sum()
    return sads


def mv_bits_est(mvx_q: int, mvy_q: int) -> int:
    """Rough rate of an integer-pel MV at decision time (quarter-pel units
    would be <<2; we store 1/16)."""
    return (2 + abs(mvx_q).bit_length() * 2
            + abs(mvy_q).bit_length() * 2)


def bitlen_int(v: int) -> int:
    """Integer bit length via threshold sums — identical formula to the JAX
    engine (no .bit_length(), so both sides agree exactly)."""
    v = abs(int(v))
    return sum(1 for k in range(15) if v >= (1 << k))


def mv_bits_q(mvx_q: int, mvy_q: int) -> int:
    """Decision-time rate of a quarter-pel MV."""
    return 2 + 2 * bitlen_int(mvx_q) + 2 * bitlen_int(mvy_q)


# half-pel then quarter-pel refinement deltas in 1/16-pel units; centre
# first so strict-less running min prefers the unrefined vector on ties
REFINE_HALF = [(0, 0), (-8, 0), (8, 0), (0, -8), (0, 8),
               (-8, -8), (8, -8), (-8, 8), (8, 8)]
REFINE_QUARTER = [(0, 0), (-4, 0), (4, 0), (0, -4), (0, 4),
                  (-4, -4), (4, -4), (-4, 4), (4, 4)]
