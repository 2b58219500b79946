"""MTT binary splits (SURVEY §2.1 Partitioner): BT-H/BT-V rectangular
leaves at the 16/32 levels, spec engine (stage 1)."""
import numpy as np

from vvctpu.spec import codec, decide, sequence as seq

from test_inter_parity import motion_frames


def textured(h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    Y = (100 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 6.0)
         + rng.integers(-6, 6, (h, w))).clip(0, 255).astype(np.int32)
    return [Y, np.full((h // 2, w // 2), 128, np.int32),
            np.full((h // 2, w // 2), 128, np.int32)]


def test_forced_bt_shapes_roundtrip():
    frames = [textured(64, 64)]

    def dfn(poc, planes, sps, cfg):
        d = decide.decide_frame(codec.pad_planes(planes, sps)[0], cfg.qp, 8)
        d.split32[:] = 0
        d.split16[:] = 0
        d.bt32[0, 0] = 1        # 32x16 halves
        d.bt32[0, 1] = 2        # 16x32 halves
        d.split32[1, 0] = 1
        d.bt16[2, 0] = 1        # 16x8 halves
        d.bt16[2, 1] = 2        # 8x16 halves
        return d

    cfg = seq.EncoderConfig(qp=32, mtt=True)
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_fn=dfn)
    out, sps = seq.decode_sequence(data, check_hash=True)
    assert sps.mtt_enabled
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])


def test_decide_uses_bt_and_improves_rd():
    frames = [textured(64, 128)]
    d0, r0, b0 = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    dd = []
    d1, r1, b1 = seq.encode_sequence(frames,
                                     seq.EncoderConfig(qp=32, mtt=True),
                                     decisions_out=dd)
    seq.decode_sequence(d1, check_hash=True)
    assert (dd[0].bt16 > 0).sum() + (dd[0].bt32 > 0).sum() > 0
    # lagrangian sanity: enabling BT should not blow up the rate at
    # comparable distortion (the decision pass only picks BT when cheaper)
    assert b1[0] < b0[0] * 1.1


def test_inter_bt_full_toolset_roundtrip():
    frames = motion_frames(5, 64, 96, seed=70)
    cfg = seq.EncoderConfig(qp=32, mtt=True, intra_period=0, gop=4,
                            mmvd=True, amvr=True, sbt=True, ciip=True,
                            bcw=True, gpm=True, affine=True, dq=True)
    dd = []
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    for p in range(5):
        for c in range(3):
            assert np.array_equal(out[p][c], recons[p][c])


def test_rect_leaves_carry_inter_motion():
    """BT leaves code merge/AMVP motion; verify decoded decisions carry the
    rect winners' MVs and that square-only tool maps are clear on rects."""
    frames = motion_frames(2, 64, 64, seed=71)
    cfg = seq.EncoderConfig(qp=30, mtt=True, intra_period=0)
    dd = []
    data, _, _ = seq.encode_sequence(frames, cfg, decisions_out=dd)
    seq.decode_sequence(data, check_hash=True)
    d = dd[1]
    rect16 = np.kron(d.bt16 > 0, np.ones((2, 2), bool))
    rect32 = np.kron(d.bt32 > 0, np.ones((4, 4), bool))
    rect = rect16 | rect32
    if rect.any():
        assert not (d.isp8[rect] > 0).any()
        assert not (d.mrl8[rect] > 0).any()
        assert not (d.ciip8[rect] > 0).any()


def test_engines_byte_identical_with_mtt():
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = motion_frames(4, 64, 96, seed=72)
    for kw in (dict(qp=32, mtt=True, mip=True, mrl=True, isp=True),
               dict(qp=32, mtt=True, intra_period=0, gop=4, mmvd=True,
                    sbt=True, ciip=True, bcw=True, gpm=True, affine=True,
                    lmcs=True, dq=True)):
        cfg = seq.EncoderConfig(**kw)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        # jax decoder reproduces the spec recon (hash-verified)
        jenc.decode_sequence(sdata, check_hash=True)
