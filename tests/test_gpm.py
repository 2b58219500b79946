"""GPM (geometric partitioning): spec roundtrip + engine parity."""
import numpy as np

from vvctpu.core import rom
from vvctpu.spec import sequence as sseq


def synth_motion(n, h, w, seed=0):
    """Occlusion-style frames: each reference matches a different half of
    the middle frames across a diagonal edge — the case GPM models."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex_a = (90 + 60 * np.sin(xx / 7.0) + 30 * np.cos(yy / 5.0))
    tex_b = (160 + 50 * np.cos(xx / 6.0) - 30 * np.sin(yy / 8.0))
    tex_c = (128 + 70 * np.sin((xx + yy) / 4.0))
    tex_d = (100 + 65 * np.cos((xx - yy) / 5.0))
    edge = (2 * xx + yy) > (w + h // 2)
    frames = []
    for t in range(n):
        if t == 0:
            y = np.where(edge, tex_c, tex_a)       # left half valid
        elif t == n - 1:
            y = np.where(edge, tex_b, tex_d)       # right half valid
        else:
            y = np.where(edge, tex_b, tex_a)       # mix: needs GPM
        y = (y + rng.integers(-4, 4, (h, w))).clip(0, 255).astype(np.int32)
        cb = (128 + 20 * np.sin(xx[::2, ::2] / 6.0)).astype(np.int32)
        cr = (128 - 18 * np.cos(yy[::2, ::2] / 5.0)).astype(np.int32)
        frames.append([y, cb, cr])
    return frames


def test_gpm_masks():
    for s in (8, 16, 32):
        all_m = rom.gpm_masks_all(s)
        assert all_m.shape == (64, s, s)
        assert all_m.min() >= 0 and all_m.max() <= 8
        # inversion pairs complement each other
        for i in range(0, 64, 2):
            assert np.array_equal(all_m[i] + all_m[i + 1], np.full((s, s), 8))
        # distinct partitions
        flat = {all_m[i].tobytes() for i in range(64)}
        assert len(flat) > 32


def test_gpm_spec_roundtrip():
    frames = synth_motion(5, 64, 64, seed=2)
    cfg = sseq.EncoderConfig(qp=30, gpm=True, intra_period=0, gop=4,
                             deblock=False, sao=False)
    decs = []
    data, recons, _ = sseq.encode_sequence(frames, cfg, decisions_out=decs)
    assert any(d.gpm8.any() for d in decs), "decision never chose GPM"
    out, sps = sseq.decode_sequence(data)
    for fo, fr in zip(out, recons):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_gpm_with_tools_roundtrip():
    frames = synth_motion(5, 64, 64, seed=7)
    cfg = sseq.EncoderConfig(qp=30, gpm=True, ciip=True, sbt=True,
                             mmvd=True, bcw=True, intra_period=0, gop=4,
                             deblock=True, sao=True)
    data, recons, _ = sseq.encode_sequence(frames, cfg)
    out, sps = sseq.decode_sequence(data)
    for fo, fr in zip(out, recons):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_gpm_pipeline_parity():
    """Pipeline engine streams byte-identical to spec with GPM on."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth_motion(5, 64, 64, seed=2)
    cfg = sseq.EncoderConfig(qp=30, gpm=True, intra_period=0, gop=4,
                             deblock=False, sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, _, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for fo, fr in zip(out, recons_s):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)


def test_gpm_pipeline_parity_refined():
    """GPM alongside DMVR/BDOF/BCW/CIIP/SBT — full BI toolset parity."""
    from vvctpu.pipeline import encoder as jenc
    frames = synth_motion(5, 64, 64, seed=4)
    cfg = sseq.EncoderConfig(qp=30, gpm=True, ciip=True, sbt=True,
                             dmvr=True, bdof=True, bcw=True, mmvd=True,
                             intra_period=0, gop=4, deblock=False,
                             sao=False)
    data_s, recons_s, _ = sseq.encode_sequence(frames, cfg)
    data_j, _, _ = jenc.encode_sequence(frames, cfg)
    assert data_s == data_j
    out, _ = jenc.decode_sequence(data_j)
    for fo, fr in zip(out, recons_s):
        for a, b in zip(fo, fr):
            assert np.array_equal(a, b)
