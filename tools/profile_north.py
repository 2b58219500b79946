"""North-star profile: 1080p RA QP32 encode+decode with per-stage timings.

Usage: python tools/profile_north.py [W] [H] [N] [GOP] [IP]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
N = int(sys.argv[3]) if len(sys.argv) > 3 else 9
GOP = int(sys.argv[4]) if len(sys.argv) > 4 else 8
IP = int(sys.argv[5]) if len(sys.argv) > 5 else 64

import os, jax
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_cpu" if jax.default_backend() == "cpu" else ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print(f"profile_north: {W}x{H} N={N} GOP={GOP} IP={IP} backend={jax.default_backend()}", file=sys.stderr)

from vvctpu.pipeline import encoder as jenc
from vvctpu.spec import sequence as seq
from vvctpu.coding import decide as jdecide
from vvctpu.pipeline import entropy

rng = np.random.default_rng(0)
frames = []
yy, xx = np.mgrid[0:H, 0:W]
for t in range(N):
    y = (90 + 70*np.sin((xx+5*t)/11.0) + 50*np.cos((yy-3*t)/8.0)
         + 25*np.sin(xx*yy/900.0)
         + rng.integers(-10, 10, (H, W))).clip(0,255).astype(np.int32)
    cb = (128 + 25*np.sin((xx[::2,::2]+2*t)/6.0)).clip(0,255).astype(np.int32)
    cr = (128 - 20*np.cos((yy[::2,::2]+t)/7.0)).clip(0,255).astype(np.int32)
    frames.append([y, cb, cr])

T = {}
def wrap(mod, name, key):
    orig = getattr(mod, name)
    def f(*a, **k):
        t0 = time.time(); r = orig(*a, **k)
        try: jax.block_until_ready(r)
        except Exception: pass
        T[key] = T.get(key, 0.0) + time.time()-t0
        return r
    setattr(mod, name, f)
    return orig

for nm in ("decide_frame", "decide_frame_p", "decide_frame_b"):
    wrap(jdecide, nm, "decide")
wrap(jenc, "_run_scan", "scan")
wrap(entropy, "encode_frame_syntax", "entropy_w")
wrap(entropy, "parse_frame_syntax", "parse")
import vvctpu.kernels.loopfilter as lfk
for nm in ("deblock_frame_j", "apply_sao_j", "apply_alf_frame_j"):
    if hasattr(lfk, nm): wrap(lfk, nm, "loopfilter")
import vvctpu.spec.sao as saomod
wrap(saomod, "decide_sao", "sao_decide")

cfg = seq.EncoderConfig(qp=32, intra_period=IP, gop=GOP)
t0=time.time(); data, recons, bits = jenc.encode_sequence(frames[:min(2,N)], cfg); t_cold=time.time()-t0
print(f"encode cold(2f): {t_cold:.1f}s; stages {dict((k, round(v,2)) for k,v in T.items())}", file=sys.stderr)
T.clear()
t0=time.time(); data, recons, bits = jenc.encode_sequence(frames, cfg); t_enc=time.time()-t0
print(f"ENCODE {N}f in {t_enc:.2f}s = {N/t_enc:.4f} fps; {sum(bits)/N:.0f} bits/frame")
print(f"  stages: {dict((k, round(v,2)) for k,v in T.items())}")
T.clear()
t0=time.time(); jenc.decode_sequence(data, check_hash=True); t_dcold=time.time()-t0
T.clear()
t0=time.time(); out,_ = jenc.decode_sequence(data, check_hash=True); t_dec=time.time()-t0
psnr = seq.psnr(frames[0][0], out[0][0])
print(f"DECODE {N}f cold {t_dcold:.2f}s warm {t_dec:.2f}s = {N/t_dec:.4f} fps (Y-PSNR {psnr:.2f})")
print(f"  stages: {dict((k, round(v,2)) for k,v in T.items())}")
