"""Affine motion (4-parameter + PROF): spec roundtrip + engine parity."""
import numpy as np

from vvctpu.spec import inter as sint
from vvctpu.spec import sequence as sseq


def synth_zoom(n, h, w, seed=0):
    """Slowly zooming + rotating smooth pattern — affine-friendly."""
    rng = np.random.default_rng(seed)
    cy, cx = h / 2.0, w / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        sc = 1.0 + 0.02 * t
        th = 0.01 * t
        u = (np.cos(th) * (xx - cx) - np.sin(th) * (yy - cy)) * sc + cx
        v = (np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy)) * sc + cy
        y = (120 + 60 * np.sin(u / 6.0) + 45 * np.cos(v / 8.0)
             + 20 * np.sin((u + v) / 15.0)
             + rng.integers(-3, 3, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 20 * np.sin(xx[::2, ::2] / 6.0)).astype(np.int32)
        cr = (128 - 18 * np.cos(yy[::2, ::2] / 5.0)).astype(np.int32)
        frames.append([y, cb, cr])
    return frames


def test_affine_model():
    """Subblock MVs follow the 4-parameter model; granule MVs match."""
    mv0, dmv = (16, -8), (8, 4)
    g = sint.affine_granule_mvs(mv0, dmv, 16)
    assert g.shape == (2, 2, 2)
    assert tuple(g[0, 0]) == sint.affine_sub_mv(mv0, dmv, 4, 4, 4)
    assert tuple(g[1, 1]) == sint.affine_sub_mv(mv0, dmv, 4, 12, 12)


def test_affine_pred_vs_translation():
    """dmv = 0 affine prediction equals plain translational MC."""
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 255, (64, 64)).astype(np.int32)
    rp = sint.pad_reference(ref)
    for mv in ((0, 0), (7, -5), (16, 32)):
        a = sint.affine_pred_luma(rp, 16, 16, 16, mv, (0, 0), 8, prof=False)
        t = sint.mc_luma(rp, 16, 16, 16, 16, mv[0], mv[1], 8)
        assert np.array_equal(a, t)


def test_affine_spec_roundtrip():
    frames = synth_zoom(3, 64, 64, seed=3)
    cfg = sseq.EncoderConfig(qp=30, affine=True, intra_period=0, gop=1,
                             deblock=False, sao=False)
    decs = []
    data, recons, _ = sseq.encode_sequence(frames, cfg, decisions_out=decs)
    assert any(d.aff8.any() for d in decs), "decision never chose affine"
    out, sps = sseq.decode_sequence(data)
    for fo, fr in zip(out, recons):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_affine_b_roundtrip():
    frames = synth_zoom(5, 64, 64, seed=5)
    cfg = sseq.EncoderConfig(qp=30, affine=True, intra_period=0, gop=4,
                             mmvd=True, sbt=True, deblock=True, sao=True)
    data, recons, _ = sseq.encode_sequence(frames, cfg)
    out, sps = sseq.decode_sequence(data)
    for fo, fr in zip(out, recons):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_affine_pipeline_parity():
    """Pipeline engine streams byte-identical to spec with affine on."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth_zoom(3, 64, 64, seed=3)
    cfg = sseq.EncoderConfig(qp=30, affine=True, intra_period=0, gop=1,
                             deblock=False, sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, _, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for fo, fr in zip(out, recons_s):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_affine_pipeline_parity_b():
    """Affine in hierarchical-B with the wider inter toolset."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth_zoom(5, 64, 64, seed=5)
    cfg = sseq.EncoderConfig(qp=30, affine=True, intra_period=0, gop=4,
                             mmvd=True, sbt=True, dmvr=True, bdof=True,
                             deblock=False, sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, _, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for fo, fr in zip(out, recons_s):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)
