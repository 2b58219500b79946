"""AMVR: adaptive MV resolution (quarter / integer / 4-pel MVD precision).

Covers SURVEY.md §2.6 AMVR (VTM amvr_flag/amvr_precision_idx +
Mv::roundToAmvrSignalPrec): precision rounding math, the rate-only
encoder decision, AMVP-candidate grid rounding (which also protects the
quarter-pel default against non-aligned TMVP-scaled candidates),
roundtrips and both-engine byte parity.
"""
import numpy as np

from vvctpu.spec import inter, sequence
from vvctpu.spec.codec import FrameDecisions


def test_round_mv_prec():
    assert inter.round_mv_prec(0, 2) == 0
    assert inter.round_mv_prec(5, 2) == 4       # 1/16 -> quarter grid
    assert inter.round_mv_prec(6, 2) == 8       # half away from zero
    assert inter.round_mv_prec(-5, 2) == -4
    assert inter.round_mv_prec(-6, 2) == -8
    assert inter.round_mv_prec(33, 4) == 32     # integer-pel grid
    assert inter.round_mv_prec(100, 6) == 128   # 4-pel grid


def test_amvr_choose_prefers_coarse_for_aligned():
    # a large 8-integer-pel MV with a zero predictor: 4-pel precision
    # shrinks the MVD magnitude and must win
    mv = (8 << 4, 0)
    cands = [(0, 0), (0, 0)]
    assert inter.amvr_choose([mv], [cands], True) == 2
    # quarter-pel-only MV: coarse grids are ineligible
    assert inter.amvr_choose([(5 << 2, 0)], [cands], True) in (0,)
    assert inter.amvr_choose([(1 << 2, 1 << 2)], [cands], True) == 0
    # disabled -> always quarter
    assert inter.amvr_choose([mv], [cands], False) == 0


def moving_planes(n, h, w, seed=0, step=8):
    """Integer global pan of `step` px/frame — AMVR's best case."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 8, w + 8 * (n + 2))).astype(np.int32)
    big = (np.pad(big, 1, mode="edge")[:-2, :-2] + big * 6) // 7
    frames = []
    for t in range(n):
        off = t * step
        y = big[4:4 + h, off:off + w]
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = np.full((h // 2, w // 2), 130, np.int32)
        frames.append([y, cb, cr])
    return frames


def test_amvr_roundtrip():
    """IPPP with integer pan: AMVR must roundtrip hash-clean with at most
    noise-level rate overhead (the ctx-coded flag) on a merge-friendly
    clip."""
    frames = moving_planes(4, 64, 160, seed=3, step=8)
    bits = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                     intra_period=0, gop=1, amvr=flag)
        data, recons, b = sequence.encode_sequence(list(frames), cfg)
        out, sps = sequence.decode_sequence(data)
        assert sps.amvr_enabled == flag
        for poc in range(4):
            for a, c in zip(out[poc], recons[poc]):
                assert np.array_equal(a, c)
        bits[flag] = sum(x for x in b if x)
    assert bits[True] <= bits[False] * 1.01


def test_amvr_saves_on_diverse_integer_motion():
    """Forced 8x8 leaves with random large integer MVs (no merge matches):
    coarse MVD precision must cut the bits."""
    rng = np.random.default_rng(5)
    frames = moving_planes(2, 64, 96, seed=5, step=0)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc == 0:
            return dec
        dec.split32[:] = 1
        dec.split16[:] = 1
        dec.inter8[:] = 1
        gh, gw = dec.mv8.shape[:2]
        r = np.random.default_rng(7)
        dec.mv8[..., 0] = r.integers(-8, 9, (gh, gw)) << 4   # integer pel
        dec.mv8[..., 1] = r.integers(-8, 9, (gh, gw)) << 4
        return dec

    bits = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                     intra_period=0, gop=1, amvr=flag)
        data, recons, b = sequence.encode_sequence(
            list(frames), cfg, decisions_fn=decisions_fn)
        out, _ = sequence.decode_sequence(data)
        for poc in range(2):
            for a, c in zip(out[poc], recons[poc]):
                assert np.array_equal(a, c)
        bits[flag] = b[1]
    assert bits[True] < bits[False]


def test_code_mv_list_nonaligned_candidate_roundtrip():
    """AMVP candidates that are not on the MVD grid (as TMVP scaling
    produces) must be rounded to it, or (mv - cand) >> shift truncates and
    the decoder reconstructs a different MV.  Direct regression guard on
    the shared coder."""
    from vvctpu.cabac import contexts as C
    from vvctpu.cabac.engine import CabacDecoder, CabacEncoder
    from vvctpu.spec.codec import code_mv_list
    from vvctpu.spec.residual import DecIO, EncIO

    mv_map = np.zeros((8, 8, 2, 2), np.int32)
    inter_map = np.zeros((8, 8, 2), bool)
    # left neighbour of the leaf at (8, 0) holds a 13/16-pel MV
    inter_map[0, 0, 0] = True
    mv_map[0, 0, 0] = (13, -7)
    for mv in ((16, 0), (4, -8), (0, 0), (-128, 64)):
        enc = CabacEncoder(C.make_ctx_state(1, 32))
        got = code_mv_list(EncIO(enc), mv_map, inter_map, 8, 0, 8, 0, mv)
        assert got == mv
        enc.terminate(1)
        dec = CabacDecoder(C.make_ctx_state(1, 32), enc.finish())
        out = code_mv_list(DecIO(dec), mv_map, inter_map, 8, 0, 8, 0)
        assert tuple(out) == mv, f"mv {mv} decoded as {out}"


def test_amvr_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = moving_planes(5, 64, 128, seed=11, step=4)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=4, amvr=True,
                                 mmvd=True, bcw=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)
