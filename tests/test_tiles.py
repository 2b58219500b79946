"""Tiles (SURVEY §2.10): per-tile prediction + entropy break, entry points,
independent CABAC substreams; both engines byte-identical."""
import numpy as np
import pytest

from vvctpu.core import bitstream as bs
from vvctpu.spec import hls, sequence as seq

from test_inter_parity import motion_frames


def test_tile_grid_uniform():
    assert hls.tile_grid(4, 2, 2, 1) == [(0, 0, 2, 2), (2, 0, 4, 2)]
    assert hls.tile_grid(3, 3, 2, 3) == [
        (0, 0, 1, 1), (1, 0, 3, 1), (0, 1, 1, 2), (1, 1, 3, 2),
        (0, 2, 1, 3), (1, 2, 3, 3)]


def test_spec_roundtrip_tiles():
    frames = motion_frames(3, 64, 128, seed=81)
    for kw in (dict(qp=32, tile_cols=2, tile_rows=1),
               dict(qp=32, tile_cols=2, tile_rows=1, intra_period=0,
                    gop=2, mmvd=True, mtt=True, dq=True)):
        data, recons, _ = seq.encode_sequence(frames,
                                              seq.EncoderConfig(**kw))
        out, sps = seq.decode_sequence(data, check_hash=True)
        for p in range(3):
            for c in range(3):
                assert np.array_equal(out[p][c], recons[p][c])


def test_tile_prediction_break():
    """A vertical edge at the tile boundary must not leak intra prediction
    across: encode a frame whose left half is flat and right half busy
    with a 2x1 tile grid; the tiles' streams decode independently of each
    other's pixels (hash check is the oracle)."""
    rng = np.random.default_rng(3)
    Y = np.full((64, 128), 100, np.int32)
    Y[:, 64:] = rng.integers(0, 255, (64, 64))
    frames = [[Y, np.full((32, 64), 128, np.int32),
               np.full((32, 64), 128, np.int32)]]
    data, recons, _ = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, tile_cols=2, tile_rows=1))
    out, _ = seq.decode_sequence(data, check_hash=True)
    assert np.array_equal(out[0][0], recons[0][0])


def test_tiles_wpp_exclusive():
    frames = motion_frames(1, 128, 128, seed=82)
    with pytest.raises(ValueError):
        seq.encode_sequence(frames, seq.EncoderConfig(
            qp=32, tile_cols=2, tile_rows=1, wpp=True))


def test_engines_byte_identical_with_tiles():
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(3, 64, 128, seed=83)
    for kw in (dict(qp=32, tile_cols=2, tile_rows=1),
               dict(qp=32, tile_cols=2, tile_rows=2, intra_period=0,
                    gop=2, mmvd=True, ciip=True, sbt=True, lmcs=True)):
        cfg = seq.EncoderConfig(**kw)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        jenc.decode_sequence(sdata, check_hash=True)
