"""Benchmark entry point (driver-run on real TPU hardware).

Encodes the BASELINE.json config-#1 workload shape (All-Intra 416x240 8-bit
QP32) with the JAX pipeline engine and reports steady-state encode fps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is against the VTM single-thread estimate for this config
(~0.5 fps on a modern x86 core — public CTC experience; BASELINE.md notes it
is unverified in this offline environment; BASELINE.json "published" is
empty).  Stage timings go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

VTM_BASELINE_FPS = 0.5  # single-thread VTM estimate, 416x240 AI QP32
W, H, QP, NFRAMES = 416, 240, 32, 4


def synth_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (90 + 70 * np.sin((xx + 5 * t) / 11.0)
             + 50 * np.cos((yy - 3 * t) / 8.0)
             + 25 * np.sin(xx * yy / 900.0)
             + rng.integers(-10, 10, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 25 * np.sin((xx[::2, ::2] + 2 * t) / 6.0)).clip(
            0, 255).astype(np.int32)
        cr = (128 - 20 * np.cos((yy[::2, ::2] + t) / 7.0)).clip(
            0, 255).astype(np.int32)
        frames.append([y, cb, cr])
    return frames


def main() -> int:
    import jax
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vvctpu.pipeline import encoder as jenc
    from vvctpu.spec import sequence as seq

    print(f"bench: devices={jax.devices()}", file=sys.stderr)
    frames = synth_frames(NFRAMES, H, W)
    cfg = seq.EncoderConfig(qp=QP)

    # warmup (compile) on frame 0
    t0 = time.time()
    jenc.encode_sequence(frames[:1], cfg)
    t_warm = time.time() - t0
    print(f"bench: warmup (incl. compile) {t_warm:.1f}s", file=sys.stderr)

    t0 = time.time()
    data, recons, bits = jenc.encode_sequence(frames, cfg)
    dt = time.time() - t0
    fps = NFRAMES / dt

    # sanity: self-check decode of the first frame's stream
    dec_frames, _ = jenc.decode_sequence(data, check_hash=True)
    psnr = seq.psnr(frames[0][0], dec_frames[0][0])
    print(f"bench: {NFRAMES} frames in {dt:.2f}s, "
          f"{sum(bits) / NFRAMES:.0f} bits/frame, Y-PSNR {psnr:.2f} dB "
          f"(hash verified)", file=sys.stderr)

    print(json.dumps({
        "metric": "encode_fps_416x240_AI_QP32",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": round(fps / VTM_BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
