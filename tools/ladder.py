"""Quality ladder: QP 22/27/32/37 rate-distortion sweep on structured clips.

The reference gates every change on CTC BD-rate (SURVEY.md §4: AI/RA cfgs x
QP 22/27/32/37 + Bjontegaard sheet vs anchor).  No VTM binary exists in this
environment, so the anchor is the PREVIOUS ROUND's ladder file: this tool
emits LADDER_r{N}.json and `--compare old.json` prints per-clip BD-rate so
every perf or tool change is auditable against a quality regression.

Three synthetic-but-structured clips (deterministic, seeded):
  * detail  — textured scene, slow pan (gentle motion, intra/residual heavy)
  * motion  — fast global pan + independently moving block (stresses ME
              range; VTM:EncoderLib/InterSearch xTZSearch analog)
  * screen  — flat text-like glyphs + repeated tiles (IBC/TS/palette shaped)

Usage:
  python tools/ladder.py [--out LADDER_r04.json] [--frames 9] [--size WxH]
        [--spec-check] [--compare LADDER_r03.json] [--flat-bits] [--quick]

--spec-check additionally runs the NumPy spec engine on one (clip, qp)
point and asserts byte-equality with the JAX pipeline stream.
--flat-bits disables the CABAC-estimate decision-bit tables (A/B for the
fractional-bit RD work; sets VVCTPU_FLAT_BITS=1).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QPS = (22, 27, 32, 37)


# ---------------------------------------------------------------------------
# clip generators — int32 planes [y, cb, cr], 4:2:0
# ---------------------------------------------------------------------------

def _textured_bg(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h * 2, 0:w * 2]          # 2x canvas so pans can crop
    y = (96 + 60 * np.sin(xx / 13.0) + 40 * np.cos(yy / 9.0)
         + 28 * np.sin((xx + yy) / 5.0) + 18 * np.sin(xx * yy / 700.0)
         + rng.integers(-6, 7, (h * 2, w * 2)))
    return y


def clip_detail(n, h, w):
    """Texture with a slow 1 px/frame diagonal pan."""
    bg = _textured_bg(h, w, seed=11)
    frames = []
    for t in range(n):
        ox, oy = t, t // 2
        y = bg[oy:oy + h, ox:ox + w].clip(0, 255).astype(np.int32)
        cb = (118 + 24 * np.sin((np.arange(w // 2)[None, :] + t) / 7.0)
              + 10 * np.cos(np.arange(h // 2)[:, None] / 5.0)
              ).clip(0, 255).astype(np.int32) * np.ones((h // 2, 1), int)
        cr = (134 - 20 * np.cos((np.arange(h // 2)[:, None] + t) / 6.0)
              ).clip(0, 255).astype(np.int32) * np.ones((1, w // 2), int)
        frames.append([y, np.ascontiguousarray(cb, np.int32),
                       np.ascontiguousarray(cr, np.int32)])
    return frames


def clip_motion(n, h, w, pan=12):
    """Fast global pan (``pan`` px/frame) + a 32x32 block moving against it.

    At pan=12 a B frame 4 pictures from its anchor needs a 48-pel MV —
    far outside a +-16 search range; this clip makes ME-range work visible
    in the ladder (VERDICT r3 weak #7/#8)."""
    bg = _textured_bg(h, w, seed=23)
    frames = []
    for t in range(n):
        ox = min(pan * t, w)
        y = bg[0:h, ox:ox + w].clip(0, 255).copy()
        # moving foreground block (opposite direction, 6 px/frame)
        bx = (w - 48 - 6 * t) % (w - 32)
        by = h // 3
        yy, xx = np.mgrid[0:32, 0:32]
        y[by:by + 32, bx:bx + 32] = (
            40 + 170 * ((xx // 4 + yy // 4) % 2)).astype(y.dtype)
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cb[(by + 8) // 2:(by + 40) // 2, bx // 2:(bx + 32) // 2] = 150
        cr = np.full((h // 2, w // 2), 130, np.int32)
        frames.append([y.astype(np.int32), cb, cr])
    return frames


def clip_screen(n, h, w):
    """Screen content: glyph-like 8x8 patterns on flat bands, a scrolling
    text row, repeated tiles (IBC/TS/palette shaped)."""
    rng = np.random.default_rng(37)
    glyphs = rng.integers(0, 2, (16, 8, 8)) * 200 + 30   # 16 glyph bitmaps
    frames = []
    for t in range(n):
        y = np.full((h, w), 235, np.int32)
        # header band
        y[: h // 4] = 60
        # repeated tiled pattern region (IBC target)
        tile = glyphs[3]
        y[h // 4:h // 2] = np.tile(tile, (h // 4 // 8, w // 8))[
            : h // 4, :w]
        # "text" rows: glyph runs, scrolling 8 px/frame
        for row in range(h // 2, h - 8, 16):
            ids = rng.integers(0, 16, w // 8 + n)
            for c in range(w // 8):
                y[row:row + 8, c * 8:(c + 1) * 8] = glyphs[ids[c + t]]
        cb = np.full((h // 2, w // 2), 128, np.int32)
        cb[: h // 8] = 100
        cr = np.full((h // 2, w // 2), 128, np.int32)
        cr[: h // 8] = 160
        frames.append([y, cb, cr])
    return frames


def clip_pan48(n, h, w):
    """Hard pan: 48 px/frame global motion (VERDICT r4 ask #9) — far past
    the +-16 dense range even at reference distance 1."""
    bg = _textured_bg(h, w + 48 * n, seed=41)
    frames = []
    for t in range(n):
        ox = 48 * t
        y = bg[0:h, ox:ox + w].clip(0, 255).astype(np.int32)
        cb = np.full((h // 2, w // 2), 118, np.int32)
        cr = np.full((h // 2, w // 2), 132, np.int32)
        frames.append([y, cb, cr])
    return frames


def clip_occl(n, h, w):
    """Occlusion: a large moving foreground object covers and uncovers
    textured background (merge/intra fallback stress)."""
    bg = _textured_bg(h, w, seed=53)
    frames = []
    for t in range(n):
        y = bg[0:h, 0:w].clip(0, 255).copy()
        bw_, bh_ = w // 3, h // 2
        bx = (t * 24) % max(w - bw_, 1)
        by = h // 4
        yy, xx = np.mgrid[0:bh_, 0:bw_]
        y[by:by + bh_, bx:bx + bw_] = (
            170 + 40 * np.sin((xx + yy) / 3.0)).astype(y.dtype)
        cb = np.full((h // 2, w // 2), 124, np.int32)
        cb[by // 2:(by + bh_) // 2, bx // 2:(bx + bw_) // 2] = 96
        cr = np.full((h // 2, w // 2), 128, np.int32)
        frames.append([y.astype(np.int32), cb, cr])
    return frames


def clip_textgrad(n, h, w):
    """Text glyphs over a smooth gradient (screen content where flat-band
    assumptions break; VERDICT r4 ask #9)."""
    rng = np.random.default_rng(67)
    glyphs = rng.integers(0, 2, (16, 8, 8)) * 190 + 40
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (40 + 170 * xx / w + 20 * yy / h)
    frames = []
    for t in range(n):
        y = grad.copy()
        for row in range(8, h - 8, 16):
            ids = rng.integers(0, 16, w // 8 + n)
            for c in range(1, w // 8 - 1):
                g = glyphs[ids[c + t]]
                m = g > 100
                blk = y[row:row + 8, c * 8:(c + 1) * 8]
                blk[m] = 235
        cb = np.full((h // 2, w // 2), 128, np.int32)
        cr = np.full((h // 2, w // 2), 140, np.int32)
        frames.append([y.clip(0, 255).astype(np.int32), cb, cr])
    return frames


CLIPS = {"detail": clip_detail, "motion": clip_motion, "screen": clip_screen,
         "pan48": clip_pan48, "occl": clip_occl, "textgrad": clip_textgrad}

# round-5 additions (VERDICT r4 ask #9): larger frames, >=48 px/frame pan,
# occlusion, text-over-gradient; the new clips run the WIDE toolset (rect
# leaves via MTT/TT + ISP/MIP/MRL) so wide-angle intra and table changes
# are actually priced — the legacy trio keeps its round-4 toolset for
# BD comparability with the committed LADDER_r04.json anchor.
NEW_CLIPS = ("pan48", "occl", "textgrad")
# 448x256 (class-D-plus) keeps the wide-toolset points affordable on one
# chip; pan48's 48 px/frame pan still exceeds the dense +-16 range 3x over
NEW_SIZE = {"pan48": (448, 256), "occl": (448, 256), "textgrad": (256, 128)}


def _cfg(qp, seq):
    """Ladder toolset: the north-star RA shape (GOP + WPP + default tools)
    with the screen clips additionally enabling IBC/TS and the round-5
    clips the rect-leaf toolset."""
    kw = dict(qp=qp, intra_period=16, gop=8, wpp=True)
    if seq in ("screen", "textgrad"):
        kw.update(ibc=True, tskip=True)
    if seq in NEW_CLIPS:
        kw.update(mtt=True, tt=True, isp=True, mip=True, mrl=True)
    return kw


def run_point(seq_name, frames, qp, *, spec_check=False):
    from vvctpu.pipeline import encoder as jenc
    from vvctpu.spec import sequence as sseq
    cfg = sseq.EncoderConfig(**_cfg(qp, seq_name))
    t0 = time.time()
    data, _recons, bits = jenc.encode_sequence(frames, cfg)
    enc_s = time.time() - t0
    dec, _ = jenc.decode_sequence(data, check_hash=True)
    n = len(frames)
    ps = [[sseq.psnr(frames[i][c], dec[i][c]) for i in range(n)]
          for c in range(3)]
    if spec_check:
        data_spec, _, _ = sseq.encode_sequence(frames, cfg)
        assert data_spec == data, (
            f"spec/jax stream mismatch at {seq_name} qp{qp}")
    return {"bits_per_frame": round(sum(bits) / n, 1),
            "psnr_y": round(float(np.mean(ps[0])), 3),
            "psnr_u": round(float(np.mean(ps[1])), 3),
            "psnr_v": round(float(np.mean(ps[2])), 3),
            "enc_s": round(enc_s, 1)}


# ---------------------------------------------------------------------------
# Bjontegaard delta-rate between two ladders (cubic log-rate fit)
# ---------------------------------------------------------------------------

def bd_rate(anchor_pts, test_pts):
    """BD-rate (%) of test vs anchor; pts = [(bits, psnr), ...]."""
    a = sorted(anchor_pts, key=lambda p: p[1])
    t = sorted(test_pts, key=lambda p: p[1])
    lr_a = np.log([p[0] for p in a])
    lr_t = np.log([p[0] for p in t])
    pa = np.polyfit([p[1] for p in a], lr_a, 3)
    pt = np.polyfit([p[1] for p in t], lr_t, 3)
    lo = max(min(p[1] for p in a), min(p[1] for p in t))
    hi = min(max(p[1] for p in a), max(p[1] for p in t))
    if hi <= lo:
        return float("nan")
    ia = np.polyint(pa)
    it = np.polyint(pt)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float((np.exp(avg_t - avg_a) - 1.0) * 100.0)


def compare(old_path, new_results):
    with open(old_path) as f:
        old = json.load(f)
    out = {}
    for seq, pts in new_results.items():
        if seq not in old.get("results", {}):
            continue
        a = [(old["results"][seq][str(q)]["bits_per_frame"],
              old["results"][seq][str(q)]["psnr_y"]) for q in QPS
             if str(q) in old["results"][seq]]
        t = [(pts[str(q)]["bits_per_frame"], pts[str(q)]["psnr_y"])
             for q in QPS if str(q) in pts]
        if len(a) >= 3 and len(t) >= 3:
            out[seq] = round(bd_rate(a, t), 2)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="LADDER_r04.json")
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--size", default="256x128")
    ap.add_argument("--spec-check", action="store_true")
    ap.add_argument("--compare", default=None,
                    help="previous ladder json; print BD-rate vs it")
    ap.add_argument("--flat-bits", action="store_true",
                    help="disable CABAC-estimate decision bits (A/B)")
    ap.add_argument("--quick", action="store_true",
                    help="2 QPs, 5 frames (smoke)")
    ap.add_argument("--clips", default=None,
                    help="comma list subset of detail,motion,screen")
    args = ap.parse_args(argv)

    if args.flat_bits:
        os.environ["VVCTPU_FLAT_BITS"] = "1"
    w, h = (int(v) for v in args.size.split("x"))
    qps = (27, 37) if args.quick else QPS
    nf = 5 if args.quick else args.frames
    names = (args.clips.split(",") if args.clips else list(CLIPS))

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = {}
    for name in names:
        cw, ch = NEW_SIZE.get(name, (w, h))
        frames = CLIPS[name](nf, ch, cw)
        results[name] = {}
        for i, qp in enumerate(qps):
            pt = run_point(name, frames, qp,
                           spec_check=args.spec_check and i == 0)
            results[name][str(qp)] = pt
            print(f"ladder: {name:7s} qp{qp}: {pt['bits_per_frame']:9.1f} "
                  f"bits/frame  Y {pt['psnr_y']:6.2f}  U {pt['psnr_u']:6.2f}"
                  f"  V {pt['psnr_v']:6.2f}  ({pt['enc_s']:.1f}s)",
                  file=sys.stderr)

    doc = {"size": args.size, "frames": nf,
           "toolset": {s: _cfg(32, s) for s in names},
           "flat_bits": bool(args.flat_bits),
           "results": results}
    if args.compare and os.path.exists(args.compare):
        doc["bd_rate_vs"] = {"anchor": args.compare,
                             "bd_rate_y_pct": compare(args.compare, results)}
        print(f"ladder: BD-rate vs {args.compare}: "
              f"{doc['bd_rate_vs']['bd_rate_y_pct']}", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"ladder": args.out, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
