"""Stage-timing profile of the decode path (host parse vs device recon).

Usage: python tools/profile_decode.py [W] [H] [NFRAMES] [--ra]
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")

W = int(sys.argv[1]) if len(sys.argv) > 1 else 832
H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
N = int(sys.argv[3]) if len(sys.argv) > 3 else 2
RA = "--ra" in sys.argv

import os
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vvctpu.pipeline import encoder as jenc
from vvctpu.spec import sequence as seq

rng = np.random.default_rng(0)
frames = []
for t in range(N):
    yy, xx = np.mgrid[0:H, 0:W]
    y = (90 + 70*np.sin((xx+5*t)/11.0) + 50*np.cos((yy-3*t)/8.0)
         + rng.integers(-10, 10, (H, W))).clip(0,255).astype(np.int32)
    cb = (128 + 25*np.sin((xx[::2,::2]+2*t)/6.0)).clip(0,255).astype(np.int32)
    cr = (128 - 20*np.cos((yy[::2,::2]+t)/7.0)).clip(0,255).astype(np.int32)
    frames.append([y, cb, cr])

cfg = seq.EncoderConfig(qp=32) if not RA else seq.EncoderConfig(qp=32, intra_period=16, gop=8)
t0=time.time(); data, recons, bits = jenc.encode_sequence(frames, cfg); t_enc=time.time()-t0
print(f"encode: {t_enc:.2f}s ({N/t_enc:.3f} fps warm+cold mixed), {sum(bits)/N:.0f} bits/frame", file=sys.stderr)

# instrument decode stages
import vvctpu.pipeline.entropy as entropy
import vvctpu.pipeline.encoder as enc2
T = {"parse": 0.0, "scan": 0.0}
orig_parse = entropy.parse_frame_syntax
def timed_parse(*a, **k):
    t0 = time.time(); r = orig_parse(*a, **k); T["parse"] += time.time()-t0
    return r
entropy.parse_frame_syntax = timed_parse
orig_scan = enc2._run_scan
def timed_scan(*a, **k):
    t0 = time.time(); r = orig_scan(*a, **k); T["scan"] += time.time()-t0
    return r
enc2._run_scan = timed_scan

t0=time.time(); jenc.decode_sequence(data, check_hash=True); t_cold=time.time()-t0
T["parse"]=T["scan"]=0.0
t0=time.time(); jenc.decode_sequence(data, check_hash=True); t_dec=time.time()-t0
other = t_dec - T["parse"] - T["scan"]
print(f"decode cold: {t_cold:.2f}s; warm: {t_dec:.2f}s = {N/t_dec:.3f} fps")
print(f"  parse(host): {T['parse']:.2f}s  scan(device): {T['scan']:.2f}s  other(loopfilters etc): {other:.2f}s")
