"""GOP/segment-parallel DP axis (SURVEY §2.10/§2.11): in-memory Parcat."""
import numpy as np
import pytest

from vvctpu.dist.gop import encode_gop_parallel, segment_bounds
from vvctpu.io.parcat import parcat
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def test_segment_bounds_gop_aligned():
    assert segment_bounds(16, 2, 4) == [(0, 8), (8, 16)]
    assert segment_bounds(10, 3, 4) == [(0, 4), (4, 8), (8, 10)]
    assert segment_bounds(3, 8, 1) == [(0, 1), (1, 2), (2, 3)]


def test_equals_manual_parcat_and_decodes():
    frames = motion_frames(6, 64, 96, seed=40)
    cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=2, mmvd=True)
    d1, _, _ = seq.encode_sequence(frames[:4], cfg)
    d2, _, _ = seq.encode_sequence(frames[4:], cfg)
    manual = parcat([d1, d2])
    got, recons, bits = encode_gop_parallel(frames, cfg, segments=2)
    assert got == manual
    out, _ = seq.decode_sequence(got, check_hash=True)
    assert len(out) == 6
    for p in range(6):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_threaded_matches_sequential():
    frames = motion_frames(4, 64, 64, seed=41)
    cfg = seq.EncoderConfig(qp=32)
    a, _, _ = encode_gop_parallel(frames, cfg, segments=2, threads=False)
    b, _, _ = encode_gop_parallel(frames, cfg, segments=2, threads=True)
    assert a == b


def test_segment_for_process():
    from vvctpu.dist.gop import segment_for_process
    assert segment_for_process(16, 2, 4, process_index=0) == (0, 8)
    assert segment_for_process(16, 2, 4, process_index=1) == (8, 16)
