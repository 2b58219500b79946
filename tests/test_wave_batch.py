"""Frame-batched wavefront engine (pipeline/wave.frame_wave_batch).

The merged multi-frame schedule must reproduce each frame's single-frame
scan bit-exactly (per-frame slab isolation + availability), and the
batched AI encoder path must produce byte-identical streams to the
per-frame pipeline (and hence to the spec engine).
"""
import os

import numpy as np
import pytest

from vvctpu.coding import decide as jdecide
from vvctpu.pipeline import encoder as jenc
from vvctpu.pipeline import recon, wave
from vvctpu.spec import sequence as seq
from vvctpu.spec.transform import lambda_rd_int


def synth(n, h, w, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (90 + 70 * np.sin((xx + 3 * t) / 11.0)
             + 50 * np.cos((yy - 2 * t) / 8.0)
             + rng.integers(-10, 10, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 25 * np.sin((xx[::2, ::2] + t) / 6.0)).clip(
            0, 255).astype(np.int32)
        cr = (128 - 20 * np.cos((yy[::2, ::2] + t) / 7.0)).clip(
            0, 255).astype(np.int32)
        out.append([y, cb, cr])
    return out


@pytest.mark.quick
def test_batch_matches_single_frame():
    H, W = 128, 192
    frames = synth(3, H, W)
    kw = dict(frame_w=W, frame_h=H, qp=32, bd=8, encode=True, rdoq=True,
              lam_rd=lambda_rd_int(32))
    fin, singles = [], []
    for (y, cb, cr) in frames:
        dec = jdecide.decide_frame(y, 32, 8)
        slots = recon.make_slots(dec, H, W)
        fin.append(dict(slots=slots, py=y, pcb=cb, pcr=cr))
        singles.append([np.asarray(o)
                        for o in wave.frame_wave(slots, y, cb, cr, **kw)])
    outs = wave.frame_wave_batch(fin, **kw)
    for got, want in zip(outs, singles):
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), w_)


def test_batched_ai_encoder_byte_equal():
    frames = synth(5, 64, 128, seed=7)
    cfg = seq.EncoderConfig(qp=32)
    os.environ["VVCTPU_NO_FRAME_BATCH"] = "1"
    try:
        d0, r0, b0 = jenc.encode_sequence(frames, cfg)
    finally:
        del os.environ["VVCTPU_NO_FRAME_BATCH"]
    d1, r1, b1 = jenc.encode_sequence(frames, cfg)
    assert d0 == d1
    out, _ = jenc.decode_sequence(d1, check_hash=True)
    assert len(out) == 5


def test_batched_b_layer_byte_equal():
    frames = synth(9, 64, 128, seed=11)
    cfg = seq.EncoderConfig(qp=33, intra_period=8, gop=8)
    os.environ["VVCTPU_NO_FRAME_BATCH"] = "1"
    try:
        d0, r0, _ = jenc.encode_sequence(frames, cfg)
    finally:
        del os.environ["VVCTPU_NO_FRAME_BATCH"]
    d1, r1, _ = jenc.encode_sequence(frames, cfg)
    assert d0 == d1
    for a, b in zip(r0, r1):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
    out, _ = jenc.decode_sequence(d1, check_hash=True)
    assert len(out) == 9
