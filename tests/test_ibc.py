"""IBC intra block copy (SURVEY §2.2): block vectors into the current
picture's reconstructed area, I slices, square leaves; both engines."""
import numpy as np
import pytest

from vvctpu.spec import codec, sequence as seq
from vvctpu.spec.codec import ibc_legal


def screen_frame(h=128, w=128, seed=4):
    rng = np.random.default_rng(seed)
    glyph = rng.integers(0, 255, (16, 16))
    Y = np.tile(glyph, (h // 16 + 1, w // 16 + 1))[:h, :w].astype(np.int32)
    return [[Y, np.full((h // 2, w // 2), 128, np.int32),
             np.full((h // 2, w // 2), 128, np.int32)]]


def test_legality_rule():
    # fully above the current CTU row
    assert ibc_legal(64, 64, 16, 0, -64, 256, 256)
    # same CTU row, strictly left of the current CTU
    assert ibc_legal(64, 64, 16, -64, 0, 256, 256)
    # own block (overlap) illegal
    assert not ibc_legal(64, 64, 16, 0, 0, 256, 256)
    # below / right of coded area illegal
    assert not ibc_legal(64, 64, 16, 16, 0, 256, 256)
    # out of frame illegal
    assert not ibc_legal(0, 64, 16, -8, -64, 256, 256)


def test_spec_roundtrip_and_gain():
    frames = screen_frame()
    d0, _, b0 = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    dd = []
    d1, r1, b1 = seq.encode_sequence(frames,
                                     seq.EncoderConfig(qp=32, ibc=True),
                                     decisions_out=dd)
    out, sps = seq.decode_sequence(d1, check_hash=True)
    assert sps.ibc_enabled
    for c in range(3):
        assert np.array_equal(out[0][c], r1[0][c])
    assert (dd[0].ibc8 > 0).sum() > 0        # the tool fires
    assert b1[0] < b0[0] * 0.6               # big SCC gain on tiled content
    # every chosen BV is legal
    dec = dd[0]
    for gy in range(dec.ibc8.shape[0]):
        for gx in range(dec.ibc8.shape[1]):
            if dec.ibc8[gy, gx]:
                bvx, bvy = int(dec.bv8[gy, gx, 0]), int(dec.bv8[gy, gx, 1])
                assert ibc_legal(gx * 8, gy * 8, 8, bvx, bvy,
                                 sps.width, sps.height)


def test_ibc_tiles_exclusive():
    frames = screen_frame()
    with pytest.raises(ValueError):
        seq.encode_sequence(frames, seq.EncoderConfig(
            qp=32, ibc=True, tile_cols=2, tile_rows=1))


def test_engines_byte_identical_with_ibc():
    pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    frames = screen_frame(seed=5)
    for kw in (dict(qp=32, ibc=True),
               dict(qp=32, ibc=True, mtt=True, dq=True, mts=True)):
        cfg = seq.EncoderConfig(**kw)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        jenc.decode_sequence(sdata, check_hash=True)
