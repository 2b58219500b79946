"""Palette mode (SURVEY §2.2 "Palette mode"): entries + index-map runs on
I-slice square leaves, both engines."""
import numpy as np

from vvctpu.spec import codec, decide, palette, sequence as seq


def screen_frame(h, w, seed=3, n_colors=5):
    """Screen-content-like frame: random rectangles of few flat colors."""
    rng = np.random.default_rng(seed)
    cols = rng.integers(16, 240, (n_colors,))
    Y = np.full((h, w), int(cols[0]), np.int32)
    for _ in range(12):
        x0 = int(rng.integers(0, w - 8))
        y0 = int(rng.integers(0, h - 8))
        ww = int(rng.integers(8, w - x0 + 1))
        hh = int(rng.integers(8, h - y0 + 1))
        Y[y0:y0 + hh, x0:x0 + ww] = int(cols[rng.integers(0, n_colors)])
    Cb = 96 + (Y[0::2, 0::2] % 64)
    Cr = 160 - (Y[0::2, 0::2] % 32)
    return [Y, Cb.astype(np.int32), Cr.astype(np.int32)]


def test_palette_primitives():
    rng = np.random.default_rng(0)
    Y = rng.integers(0, 256, (16, 16)).astype(np.int32) // 64 * 64
    Cb = np.full((8, 8), 120, np.int32)
    Cr = np.full((8, 8), 130, np.int32)
    entries, idx = palette.derive_palette(Y, Cb, Cr, 0, 0, 16, 8)
    assert 1 <= len(entries) <= palette.MAX_PLT
    ry, rcb, rcr = palette.map_block(entries, idx)
    assert ry.shape == (16, 16) and rcb.shape == (8, 8)
    # exact cover: few distinct values -> lossless mapping
    assert np.array_equal(ry, Y)
    runs = palette.runs_of(idx)
    assert sum(r for _, r in runs) == 256


def test_forced_palette_roundtrip():
    frames = [screen_frame(64, 64)]

    def dfn(poc, planes, sps, cfg):
        d = decide.decide_frame(codec.pad_planes(planes, sps)[0], cfg.qp, 8)
        d.plt8[:4, :4] = 1      # top-left 32 leaf as palette
        d.split32[0, 0] = 0
        d.split16[:2, :2] = 0
        d.modes8[:4, :4] = 0
        d.mrl8[:4, :4] = 0
        d.isp8[:4, :4] = 0
        return d

    cfg = seq.EncoderConfig(qp=32, plt=True)
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_fn=dfn)
    out, sps = seq.decode_sequence(data, check_hash=True)
    assert sps.plt_enabled
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])


def test_decide_picks_palette_on_screen_content():
    frames = [screen_frame(64, 128, seed=4)]
    dd = []
    data, recons, bits = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, plt=True), decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    assert (dd[0].plt8 > 0).sum() > 0, "palette never chosen on SCC"
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])
    # palette should help the rate on flat-color content
    _, _, b0 = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    assert bits[0] < b0[0]


def test_palette_with_ibc_and_mtt():
    frames = [screen_frame(64, 64, seed=6)]
    cfg = seq.EncoderConfig(qp=32, plt=True, ibc=True, mtt=True)
    dd = []
    data, recons, _ = seq.encode_sequence(frames, cfg, decisions_out=dd)
    out, _ = seq.decode_sequence(data, check_hash=True)
    # mutual exclusion on granules
    assert not ((dd[0].plt8 > 0) & (dd[0].ibc8 > 0)).any()
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])


def test_engines_byte_identical_with_palette():
    import pytest
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = [screen_frame(64, 96, seed=7), screen_frame(64, 96, seed=8)]
    for kw in (dict(qp=32, plt=True),
               dict(qp=32, plt=True, ibc=True, lmcs=True),
               dict(qp=32, plt=True, tile_cols=2, tile_rows=1)):
        cfg = seq.EncoderConfig(**kw)
        dd_s, dd_j = [], []
        sdata, _, _ = seq.encode_sequence(frames, cfg, decisions_out=dd_s)
        jdata, _, _ = jenc.encode_sequence(frames, cfg, decisions_out=dd_j)
        for a, b in zip(dd_s, dd_j):
            assert a.equal(b)
        assert jdata == sdata
        jenc.decode_sequence(sdata, check_hash=True)
