"""Shard-invariance of the REAL encoder over the mesh tile axis.

SURVEY.md §4 item 6: an N-way sharded encode must produce a bit-identical
bitstream to the 1-way encode.  dist/shard.py runs each tile's phase-A
inter batch + fused wavefront scan on its own device via shard_map; these
tests assert byte-equality against the sequential tile loop and that the
sharded decoder round-trips with hash verification.
"""
import numpy as np
import pytest

from vvctpu.dist import mesh as dmesh
from vvctpu.dist import shard
from vvctpu.pipeline import encoder as jenc
from vvctpu.spec import sequence as seq


def synth(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (80 + 60 * np.sin((xx + 4 * t) / 9.0)
             + 40 * np.cos((yy - 2 * t) / 7.0)
             + rng.integers(-8, 8, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 20 * np.sin((xx[::2, ::2] + t) / 5.0)).clip(
            0, 255).astype(np.int32)
        cr = (128 - 15 * np.cos((yy[::2, ::2] + t) / 6.0)).clip(
            0, 255).astype(np.int32)
        frames.append([y, cb, cr])
    return frames


@pytest.mark.quick
def test_tile_shard_byte_equal_inter():
    frames = synth(3, 128, 256)
    cfg = seq.EncoderConfig(qp=32, intra_period=4, gop=2, tile_cols=4,
                            tile_rows=1)
    d0, r0, _ = jenc.encode_sequence(frames, cfg)
    m = dmesh.make_mesh(4, gop=1)
    with shard.use_mesh(m):
        d1, r1, _ = jenc.encode_sequence(frames, cfg)
    assert d0 == d1
    for a, b in zip(r0, r1):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
    with shard.use_mesh(m):
        out, _ = jenc.decode_sequence(d1, check_hash=True)
    assert len(out) == 3


def test_tile_shard_2x2_grid():
    frames = synth(2, 128, 128, seed=9)
    cfg = seq.EncoderConfig(qp=37, intra_period=1, tile_cols=2, tile_rows=2)
    d0, _, _ = jenc.encode_sequence(frames, cfg)
    m = dmesh.make_mesh(4, gop=1)
    with shard.use_mesh(m):
        d1, _, _ = jenc.encode_sequence(frames, cfg)
    assert d0 == d1


def test_mesh_mismatch_falls_back():
    # 2 tiles but 4-device tile axis: falls back to the sequential loop
    frames = synth(1, 64, 128, seed=5)
    cfg = seq.EncoderConfig(qp=32, intra_period=1, tile_cols=2)
    d0, _, _ = jenc.encode_sequence(frames, cfg)
    m = dmesh.make_mesh(4, gop=1)
    with shard.use_mesh(m):
        d1, _, _ = jenc.encode_sequence(frames, cfg)
    assert d0 == d1
