"""BCW: bi-prediction with CU-level weights {3,4,5}/8 (both engines).

Covers SURVEY.md §2.2 BCW/GBi (VTM:CommonLib/InterPrediction.cpp
xWeightedAverage + bcw_idx syntax): weighted-average math, forced-weight
roundtrip with hash verification, encoder weight search on a fade, and
spec-vs-pipeline byte parity.
"""
import numpy as np

from vvctpu.spec import inter, sequence
from vvctpu.spec.codec import FrameDecisions


def test_bcw_average_math():
    rng = np.random.default_rng(0)
    p0 = rng.integers(0, 256, (16, 16)).astype(np.int32)
    p1 = rng.integers(0, 256, (16, 16)).astype(np.int32)
    # index 1 (w = 4) is bit-for-bit the plain rounded average
    assert np.array_equal(inter.bcw_average(p0, p1, 1, 8),
                          np.minimum((p0 + p1 + 1) >> 1, 255))
    # weights 3 and 5 are mirrored: swap(p0, p1) swaps the indices
    assert np.array_equal(inter.bcw_average(p0, p1, 0, 8),
                          inter.bcw_average(p1, p0, 2, 8))
    # constant planes: exact integer weighting
    a = np.full((4, 4), 80, np.int32)
    b = np.full((4, 4), 160, np.int32)
    assert inter.bcw_average(a, b, 0, 8)[0, 0] == (3 * 80 + 5 * 160 + 4) >> 3
    assert inter.bcw_average(a, b, 2, 8)[0, 0] == (5 * 80 + 3 * 160 + 4) >> 3


def fade_planes(n, h, w, seed=0):
    """Static texture under a NON-linear (quadratic) fade — the BCW
    showcase: the mid B frame is not the plain average of its two
    (symmetric) references, so an unequal weight wins."""
    rng = np.random.default_rng(seed)
    base = rng.integers(16, 100, (h, w)).astype(np.int32)
    base = (np.pad(base, 1, mode="edge")[:-2, :-2] + base * 6) // 7
    frames = []
    for t in range(n):
        y = np.clip(base + t * t * 6, 0, 255).astype(np.int32)
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = np.full((h // 2, w // 2), 130, np.int32)
        frames.append([y, cb, cr])
    return frames


def test_bcw_forced_roundtrip():
    """BI leaves with forced unequal weights survive encode->decode with
    hash verification (weights correctly coded and applied)."""
    frames = fade_planes(3, 64, 96, seed=5)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=2, bcw=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc != 1:
            return dec
        dec.inter8[:] = 1
        dec.dir8[:] = 2                       # BI everywhere, refs (0, 2)
        dec.bcw8[:, : dec.bcw8.shape[1] // 2] = 0   # left: w = 3/8
        dec.bcw8[:, dec.bcw8.shape[1] // 2:] = 2    # right: w = 5/8
        return dec

    data, recons, _ = sequence.encode_sequence(list(frames), cfg,
                                               decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.bcw_enabled
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_bcw_search_picks_unequal_on_fade():
    """On a non-linear fade the encoder's BCW search must select unequal
    weights somewhere and not increase the total bits."""
    frames = fade_planes(5, 64, 96, seed=9)
    bits = {}
    decs = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False,
                                     intra_period=0, gop=4, bcw=flag)
        out = []
        _, _, b = sequence.encode_sequence(list(frames), cfg,
                                           decisions_out=out)
        bits[flag] = sum(x for x in b if x)
        decs[flag] = out
    non_default = sum(int((d.bcw8 != inter.BCW_DEFAULT).sum())
                      for d in decs[True])
    assert non_default > 0
    assert bits[True] <= bits[False]


def test_bcw_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = fade_planes(5, 64, 128, seed=17)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=4, bcw=True, mmvd=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)


def test_bcw_with_dmvr_bdof_parity():
    """Unequal weights must disable DMVR/BDOF identically in both engines."""
    from vvctpu.pipeline import encoder as jenc
    frames = fade_planes(3, 64, 64, seed=23)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=2, bcw=True,
                                 dmvr=True, bdof=True)
    ref_stream, recons, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)
