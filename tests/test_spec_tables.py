"""Spec-literal DCT2 tables (core/tables_spec.py) — VERDICT r3 ask #4.

The override hook machinery + literal values; activation is opt-in
(VVCTPU_SPEC_TABLES=1) this round, so the round-trip test installs and
uninstalls explicitly.
"""
import numpy as np
import pytest

from vvctpu.core import rom
from vvctpu.core import tables_spec as ts

pytestmark = pytest.mark.quick


def test_known_anchor_rows():
    t4 = ts.dct2_literal(4)
    assert t4.tolist() == [[64, 64, 64, 64], [83, 36, -36, -83],
                          [64, -64, -64, 64], [36, -83, 83, -36]]
    t8 = ts.dct2_literal(8)
    assert tuple(t8[1]) == (89, 75, 50, 18, -18, -50, -75, -89)
    assert tuple(ts.dct2_literal(16)[1, :8]) == (90, 87, 80, 70, 57, 43,
                                                25, 9)


def test_within_one_of_generated():
    for n in (4, 8, 16, 32):
        gen = np.asarray(rom.tr_matrix(rom.DCT2, n))
        assert np.abs(ts.dct2_literal(n) - gen).max() <= 1, n


def test_roundtrip_with_literal_tables():
    """Both engines stay self-consistent (hash-verified, byte-identical)
    with the literal matrices installed via the override hook."""
    from vvctpu.spec import sequence as sseq
    ts.install()
    try:
        rng = np.random.default_rng(5)
        h, w = 64, 64
        y = (128 + 60 * np.sin(np.arange(w)[None, :] / 5.0)
             + rng.integers(-20, 20, (h, w))).clip(0, 255).astype(np.int32)
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = np.full((h // 2, w // 2), 135, np.int32)
        cfg = sseq.EncoderConfig(qp=30, mts=True)
        data, recons, bits = sseq.encode_sequence([[y, cb, cr]], cfg)
        out, _ = sseq.decode_sequence(data, check_hash=True)
        assert np.array_equal(out[0][0], recons[0][0])
        jax = pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        jdata, _, _ = jenc.encode_sequence([[y, cb, cr]], cfg)
        assert jdata == data
        jout, _ = jenc.decode_sequence(jdata, check_hash=True)
        assert np.array_equal(jout[0][0], out[0][0])
    finally:
        ts.uninstall()   # restores _MATS/_TX_CONST + clears jit caches
