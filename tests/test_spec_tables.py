"""Spec-literal DCT2 tables (core/tables_spec.py) — default-ON since r5.

VERDICT r4 ask #3: literals install at rom import (VVCTPU_SPEC_TABLES=0
restores generated).  The round-trip test exercises BOTH table sets
through the runtime install/uninstall hooks and restores the default.
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


def test_installed_by_default():
    assert ts.installed()
    assert np.array_equal(np.asarray(rom.tr_matrix(rom.DCT2, 8)),
                          ts.dct2_literal(8))


def test_within_one_of_generated():
    ts.uninstall()
    try:
        for n in (4, 8, 16, 32):
            gen = np.asarray(rom.tr_matrix(rom.DCT2, n))
            assert np.abs(ts.dct2_literal(n) - gen).max() <= 1, n
    finally:
        ts.install()


def _roundtrip_both_engines(cfg_kw):
    from vvctpu.spec import sequence as sseq
    rng = np.random.default_rng(5)
    h, w = 64, 64
    y = (128 + 60 * np.sin(np.arange(w)[None, :] / 5.0)
         + rng.integers(-20, 20, (h, w))).clip(0, 255).astype(np.int32)
    cb = np.full((h // 2, w // 2), 120, np.int32)
    cr = np.full((h // 2, w // 2), 135, np.int32)
    cfg = sseq.EncoderConfig(**cfg_kw)
    data, recons, bits = sseq.encode_sequence([[y, cb, cr]], cfg)
    out, _ = sseq.decode_sequence(data, check_hash=True)
    assert np.array_equal(out[0][0], recons[0][0])
    jax = pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    jdata, _, _ = jenc.encode_sequence([[y, cb, cr]], cfg)
    assert jdata == data
    jout, _ = jenc.decode_sequence(jdata, check_hash=True)
    assert np.array_equal(jout[0][0], out[0][0])
    return data


def test_roundtrip_both_table_sets():
    """Both engines stay self-consistent (hash-verified, byte-identical)
    with the literal tables (default) AND the generated set via the
    runtime uninstall hook; the two table sets produce different streams
    (the override actually takes effect at runtime)."""
    cfg_kw = dict(qp=30, mts=True)
    data_lit = _roundtrip_both_engines(cfg_kw)
    ts.uninstall()
    try:
        data_gen = _roundtrip_both_engines(cfg_kw)
    finally:
        ts.install()   # restore the default (clears kernel/jit caches)
    assert data_lit != data_gen
