"""Inherited affine merge (SURVEY §2.2 "affine merge (inherited)"):
field-continuation candidates from A1/B1 affine neighbours, exact-match
merge coding in both walkers."""
import numpy as np

from vvctpu.spec import codec, decide, inter, sequence as seq

from test_inter_parity import motion_frames


def test_candidate_field_continuation():
    """The candidate reproduces the neighbour's model MV at its centre."""
    h = w = 64
    inter_map = np.zeros((h // 8, w // 8, 2), bool)
    mv_map = np.zeros((h // 8, w // 8, 2, 2), np.int32)
    aff_map = np.zeros((h // 8, w // 8), np.uint8)
    admv = np.zeros((h // 8, w // 8, 2), np.int32)
    base, dmv = (16, 0), (16, 0)
    inter_map[:4, :4, 0] = True
    aff_map[:4, :4] = 1
    admv[:4, :4] = dmv
    mv_map[:4, :4, 0] = inter.affine_granule_mvs(base, dmv, 32)
    cands = inter.affine_merge_cands(inter_map, mv_map, aff_map, admv,
                                     32, 0, 32, 0)
    assert cands, "A1 affine neighbour not found"
    bx, by, dmx, dmy = cands[0]
    # continuation: evaluating the candidate model at the neighbour
    # granule's centre reproduces the stored MV there
    g = inter.affine_sub_mv((bx, by), (dmx, dmy), 5, (3 * 8 + 4) - 32,
                            (3 * 8 + 4) - 0)
    assert tuple(g) == tuple(mv_map[3, 3, 0])
    assert (dmx, dmy) == dmv


def _forced_affine_pair(match: bool):
    frames = motion_frames(2, 64, 64, seed=41)

    def dfn(poc, planes, sps, cfg):
        d = decide.decide_frame(codec.pad_planes(planes, sps)[0], cfg.qp, 8)
        if poc == 0:
            return d
        d.split32[:] = 0
        d.split16[:] = 0
        d.inter8[:] = 1
        d.dir8[:] = 0
        d.aff8[:] = 1
        d.mv8[:] = (16, 0)
        d.admv8[:] = (16, 0)
        # left 32 leaf: base (16, 0); right leaf: the continuation base is
        # (32, 0) (see test above) — match or break it
        d.mv8[:, 4:] = (32, 0) if match else (48, 0)
        d.modes8[:] = 0
        d.mrl8[:] = 0
        d.isp8[:] = 0
        d.ciip8[:] = 0
        d.gpm8[:] = 0
        return d

    cfg = seq.EncoderConfig(qp=32, intra_period=0, affine=True)
    dd = []
    data, recons, bits = seq.encode_sequence(frames, cfg, decisions_fn=dfn,
                                             decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    for p in range(2):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])
    return bits[1]


def test_affine_merge_exact_match_saves_bits():
    b_match = _forced_affine_pair(True)
    b_miss = _forced_affine_pair(False)
    assert b_match < b_miss


def test_affine_roundtrip_with_merge_path():
    frames = motion_frames(4, 64, 96, seed=42)
    cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=4, affine=True,
                            mmvd=True)
    data, recons, _ = seq.encode_sequence(frames, cfg)
    out, _ = seq.decode_sequence(data, check_hash=True)
    for p in range(4):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_engines_byte_identical_with_affine_merge():
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(3, 64, 96, seed=43)
    cfg = seq.EncoderConfig(qp=32, intra_period=0, affine=True)
    sdata, _, _ = seq.encode_sequence(frames, cfg)
    jdata, _, _ = jenc.encode_sequence(frames, cfg)
    assert jdata == sdata
    jenc.decode_sequence(sdata, check_hash=True)
