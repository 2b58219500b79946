"""Subpictures (SURVEY §2.10 "SP with zero cross-talk"): independent
rects as layers + layout SEI; SubpicMergeApp / extractor roles."""
import numpy as np

from vvctpu.io import streamtools
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def test_subpic_encode_decode_roundtrip():
    frames = motion_frames(3, 64, 128, seed=21)
    cfg = seq.EncoderConfig(qp=32, subpic_cols=2, subpic_rows=1,
                            intra_period=0)
    data, recons, bits = seq.encode_sequence(frames, cfg)
    assert streamtools.subpic_layout(data) == (2, 1)
    out, sps = seq.decode_sequence(data, check_hash=True)
    assert len(out) == 3
    for p in range(3):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_subpic_extract_standalone():
    frames = motion_frames(2, 64, 128, seed=22)
    cfg = seq.EncoderConfig(qp=32, subpic_cols=2, subpic_rows=1)
    data, _, _ = seq.encode_sequence(frames, cfg)
    full, _ = seq.decode_sequence(data, check_hash=True)
    for k, x0 in ((0, 0), (1, 64)):
        sub = streamtools.subpic_extract(data, k)
        assert streamtools.subpic_layout(sub) is None
        out, sps = seq.decode_sequence(sub, check_hash=True)
        for p in range(2):
            assert np.array_equal(out[p][0], full[p][0][:, x0:x0 + 64])
            assert np.array_equal(out[p][1],
                                  full[p][1][:, x0 // 2:x0 // 2 + 32])


def test_subpic_merge_matches_direct_encode():
    """Independent per-rect encodes + subpic_merge == the --subpics path."""
    frames = motion_frames(2, 64, 128, seed=23)
    cfg1 = seq.EncoderConfig(qp=32)
    lefts = [[f[0][:, :64], f[1][:, :32], f[2][:, :32]] for f in frames]
    rights = [[f[0][:, 64:], f[1][:, 32:], f[2][:, 32:]] for f in frames]
    dl, _, _ = seq.encode_sequence(lefts, cfg1)
    dr, _, _ = seq.encode_sequence(rights, cfg1)
    merged = streamtools.subpic_merge([dl, dr], 2, 1)
    cfg2 = seq.EncoderConfig(qp=32, subpic_cols=2, subpic_rows=1)
    direct, _, _ = seq.encode_sequence(frames, cfg2)
    assert merged == direct


def test_subpic_nonmultiple_size_and_grid():
    frames = motion_frames(2, 100, 150, seed=24)
    cfg = seq.EncoderConfig(qp=34, subpic_cols=2, subpic_rows=2)
    data, recons, _ = seq.encode_sequence(frames, cfg)
    out, _ = seq.decode_sequence(data, check_hash=True)
    assert out[0][0].shape == (100, 150)
    for p in range(2):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_engines_byte_identical_with_subpics():
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(2, 64, 128, seed=25)
    cfg = seq.EncoderConfig(qp=32, subpic_cols=2, subpic_rows=1)
    sdata, _, _ = seq.encode_sequence(frames, cfg)
    jdata, _, _ = jenc.encode_sequence(frames, cfg)
    assert jdata == sdata
    jenc.decode_sequence(sdata, check_hash=True)
