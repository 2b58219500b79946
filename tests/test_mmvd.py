"""MMVD (merge with MVD): derivation, syntax roundtrip, pipeline parity.

Covers the SURVEY.md §2.2 MMVD line (VTM:CommonLib/UnitTools.cpp
getInterMMVDMergeCandidates): base = first 2 merge candidates, 8 distances
x 4 directions, mirrored L1 offset for BI; encoder signals MMVD when the ME
vector matches a pattern exactly.
"""
import numpy as np

from vvctpu.spec import inter, sequence
from vvctpu.spec.codec import FrameDecisions


def moving_planes(n, h, w, seed=0, step=3):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    k = np.ones((3, 3), np.int64)
    big = (np.pad(big, 1, mode="edge")[:-2, :-2] + big * 6) // 7
    frames = []
    for t in range(n):
        off = t * step
        y = big[off:off + h, off:off + w]
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = np.full((h // 2, w // 2), 130, np.int32)
        frames.append([y, cb, cr])
    return frames


def test_mmvd_derive_roundtrip():
    cand = (2, (36, -20), (-36, 20))
    seen = set()
    for di in range(8):
        for dd in range(4):
            out = inter.mmvd_derive(cand, di, dd)
            assert out[0] == 2
            seen.add(out)
            # mirrored L1 offset
            assert out[1][0] - cand[1][0] == -(out[2][0] - cand[2][0])
            assert out[1][1] - cand[1][1] == -(out[2][1] - cand[2][1])
    assert len(seen) == 32
    got = inter.mmvd_match([cand], inter.mmvd_derive(cand, 5, 2))
    assert got == (0, 5, 2)
    assert inter.mmvd_match([cand], (2, (1, 1), (-1, -1))) is None


def test_mmvd_forced_roundtrip():
    """Force decision MVs to merge-candidate + MMVD offsets; the encoder
    must signal them via MMVD and the stream must roundtrip."""
    frames = moving_planes(2, 64, 64, seed=11, step=0)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, mmvd=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc == 0:
            return dec
        dec.inter8[:] = 1
        # zero-merge candidate (0,(0,0)) + distance 16qp (=64 in 1/16), +x
        dec.mv8[..., 0] = 64
        dec.mv8[..., 1] = 0
        dec.split32[:] = 0
        return dec

    data, recons, bits = sequence.encode_sequence([f for f in frames], cfg,
                                                  decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.mmvd_enabled
    for poc in range(2):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_mmvd_engages_and_roundtrips(monkeypatch):
    """MMVD must actually be chosen for leaves whose ME vector is a pattern
    offset from a merge base, and the stream must decode bit-exact.  (Bit
    savings depend on content; engagement + correctness is the contract.)"""
    frames = moving_planes(2, 64, 64, seed=13, step=0)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, mmvd=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc == 0:
            return dec
        dec.inter8[:] = 1
        gy, gx = np.mgrid[0:sps.height // 8, 0:sps.width // 8]
        chk = ((gx // 2 + gy // 2) & 1)
        dec.mv8[..., 0] = np.where(chk, 128, -128)
        dec.mv8[..., 1] = 0
        dec.split32[:] = 1
        dec.split16[:] = 1          # 8x8 leaves: many transitions
        return dec

    hits = []
    orig = inter.mmvd_match

    def spy(cands, me):
        r = orig(cands, me)
        if r is not None:
            hits.append(r)
        return r

    monkeypatch.setattr(inter, "mmvd_match", spy)
    data, recons, _ = sequence.encode_sequence(list(frames), cfg,
                                               decisions_fn=decisions_fn)
    assert len(hits) > 0
    out, sps = sequence.decode_sequence(data)
    for poc in range(2):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_mmvd_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = moving_planes(3, 64, 128, seed=17, step=2)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=2, mmvd=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(3):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)
