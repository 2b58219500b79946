"""SMVD: symmetric MVD for explicit BI leaves with POC-symmetric refs.

Covers SURVEY.md §2.6 SMVD (VTM sym_mvd_flag + InterSearch symmetric ME,
here an opportunistic exact pattern match like MMVD): match logic, forced
roundtrip with hash verification, rate savings, and both-engine parity.
"""
import numpy as np

from vvctpu.spec import inter, sequence
from vvctpu.spec.codec import FrameDecisions


def test_smvd_match_logic():
    mv_map = np.zeros((8, 8, 2, 2), np.int32)
    inter_map = np.zeros((8, 8, 2), bool)
    # zero predictors: mirrored pair matches with i1 = 0
    assert inter.smvd_match(mv_map, inter_map, 8, 8, 8,
                            (16, -8), (-16, 8)) == 0
    # non-mirrored pair: no match
    assert inter.smvd_match(mv_map, inter_map, 8, 8, 8,
                            (16, -8), (-16, 4)) is None
    # non-zero L1 predictor in the neighbourhood shifts the mirror point
    inter_map[0, 0, 1] = True
    mv_map[0, 0, 1] = (8, 0)
    i1 = inter.smvd_match(mv_map, inter_map, 8, 0, 8, (16, 0), (-8, 0))
    assert i1 is not None   # mv1 = cand(8,0) - mvd(16,0) = (-8, 0)


def sym_planes(n, h, w, seed=0, step=2):
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


def _mirror_decisions(poc, pl, sps, c):
    """poc 1 (refs 0, 2): BI leaves with perfectly mirrored motion."""
    dec = FrameDecisions.empty(sps.height, sps.width)
    if poc != 1:
        if poc == 2:
            dec.inter8[:] = 1
            dec.mv8[..., 0] = 4 << 4
        return dec
    dec.inter8[:] = 1
    dec.dir8[:] = 2
    dec.mv8[..., 0] = -(2 << 4)      # L0 looks back 2 px
    dec.mv8_l1[..., 0] = 2 << 4      # L1 looks forward 2 px (mirror)
    return dec


def test_smvd_forced_roundtrip_and_savings():
    frames = sym_planes(3, 64, 96, seed=5, step=2)
    bits = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                     intra_period=0, gop=2, smvd=flag)
        data, recons, b = sequence.encode_sequence(
            list(frames), cfg, decisions_fn=_mirror_decisions)
        out, sps = sequence.decode_sequence(data)
        assert sps.smvd_enabled == flag
        for poc in range(3):
            for a, c2 in zip(out[poc], recons[poc]):
                assert np.array_equal(a, c2)
        bits[flag] = b[1]
    # the mirrored L1 MVD disappears from the stream
    assert bits[True] < bits[False]


def test_smvd_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = sym_planes(5, 64, 128, seed=17, step=2)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=4, smvd=True,
                                 amvr=True, bcw=True, mmvd=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)


def test_smvd_forced_pipeline_parity():
    """Mirrored forced decisions through BOTH engines (exercises the
    sym_mvd_flag = 1 path in the walker)."""
    from vvctpu.pipeline import encoder as jenc
    frames = sym_planes(3, 64, 96, seed=5, step=2)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=2, smvd=True)
    ref_stream, _, _ = sequence.encode_sequence(
        list(frames), cfg, decisions_fn=_mirror_decisions)
    got_stream, _, _ = jenc.encode_sequence(
        list(frames), cfg, decisions_fn=_mirror_decisions)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(3):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)
