"""MTT ternary splits (SURVEY §2.1 Partitioner): TT-H/TT-V stripe leaves
(s/4, s/2, s/4) at the 32 level, both engines.

Role of VTM:CommonLib/UnitPartitioner.cpp ternary-split handling
(mtt_split_cu_binary_flag = 0 path)."""
import numpy as np

from vvctpu.spec import codec, decide, sequence as seq

from test_inter_parity import motion_frames
from test_mtt import textured


def test_forced_tt_shapes_roundtrip():
    frames = [textured(64, 64, seed=9)]

    def dfn(poc, planes, sps, cfg):
        d = decide.decide_frame(codec.pad_planes(planes, sps)[0], cfg.qp, 8)
        d.split32[:] = 0
        d.split16[:] = 0
        d.bt32[:] = 0
        d.bt16[:] = 0
        d.bt32[0, 0] = 3        # TT-H: 32x8 / 32x16 / 32x8
        d.bt32[0, 1] = 4        # TT-V: 8x32 / 16x32 / 8x32
        d.bt32[1, 0] = 4
        d.bt32[1, 1] = 3
        return d

    cfg = seq.EncoderConfig(qp=32, mtt=True, tt=True)
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_fn=dfn)
    out, sps = seq.decode_sequence(data, check_hash=True)
    assert sps.tt_enabled
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])


def tt_textured(h, w, seed=11):
    """Content where the TT-H mid stripe (rows 8..24 of each 32) is
    VER-predictable only from exactly row 7: rows 7..23 carry a random
    column pattern p(x) (vertically constant), the rest is flat.  Any
    partition that does not start a leaf at row 8 mispredicts many rows
    of p; TT-H pays one noisy row (row 7, inside the cheap top stripe)
    plus 3 split bins."""
    rng = np.random.default_rng(seed)
    Y = np.full((h, w), 100, np.int32)
    p = rng.integers(30, 226, (w,)).astype(np.int32)
    yy = np.arange(h) % 32
    Y[(yy >= 7) & (yy < 24)] = p[None, :]
    Y[yy >= 24] = 60
    return [Y, np.full((h // 2, w // 2), 128, np.int32),
            np.full((h // 2, w // 2), 128, np.int32)]


def test_decide_picks_tt_and_roundtrips():
    frames = [tt_textured(64, 128)]
    dd = []
    data, recons, bits = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, mtt=True, tt=True),
        decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    assert (dd[0].bt32 >= 3).sum() > 0, "TT never chosen on TT-shaped content"
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])


def test_tt_rd_not_worse():
    frames = [tt_textured(64, 128, seed=12)]
    _, _, b0 = seq.encode_sequence(frames, seq.EncoderConfig(qp=32,
                                                             mtt=True))
    _, _, b1 = seq.encode_sequence(frames, seq.EncoderConfig(qp=32,
                                                             mtt=True,
                                                             tt=True))
    assert b1[0] < b0[0] * 1.1


def test_inter_tt_roundtrip():
    frames = motion_frames(5, 64, 96, seed=80)
    cfg = seq.EncoderConfig(qp=32, mtt=True, tt=True, intra_period=0,
                            gop=4, mmvd=True, dq=True)
    dd = []
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    for p in range(5):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_tt_leaves_square_tools_clear():
    frames = [tt_textured(64, 64, seed=13)]
    dd = []
    data, _, _ = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, mtt=True, tt=True, mip=True,
                                  mrl=True, isp=True),
        decisions_out=dd)
    seq.decode_sequence(data, check_hash=True)
    d = dd[0]
    ttg = np.kron(d.bt32 >= 3, np.ones((4, 4), bool))
    if ttg.any():
        assert not (d.isp8[ttg] > 0).any()
        assert not (d.mrl8[ttg] > 0).any()


def test_engines_byte_identical_with_tt():
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(4, 64, 96, seed=81)
    for kw in (dict(qp=32, mtt=True, tt=True, mip=True, mrl=True,
                    isp=True),
               dict(qp=32, mtt=True, tt=True, intra_period=0, gop=4,
                    mmvd=True, sbt=True, ciip=True, bcw=True, gpm=True,
                    affine=True, lmcs=True, dq=True)):
        cfg = seq.EncoderConfig(**kw)
        dd_s, dd_j = [], []
        sdata, _, _ = seq.encode_sequence(frames, cfg, decisions_out=dd_s)
        jdata, _, _ = jenc.encode_sequence(frames, cfg, decisions_out=dd_j)
        for a, b in zip(dd_s, dd_j):
            assert a.equal(b)
        assert jdata == sdata
        jenc.decode_sequence(sdata, check_hash=True)
