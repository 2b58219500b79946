"""SBT: sub-block transform of the inter luma residual (both engines).

Covers SURVEY.md §2.3 SBT (VTM:CommonLib/TrQuant.cpp SBT paths +
EncoderLib/InterSearch SBT loop): geometry/kernel tables, a forced-index
roundtrip with hash verification, the RD search firing on half-block
residuals, and spec-vs-pipeline byte parity.
"""
import numpy as np

from vvctpu.spec import sequence, transform
from vvctpu.spec.codec import FrameDecisions


def test_sbt_geometry_and_inverse():
    """sbt_reconstruct inverts choose_sbt's winning candidate exactly on a
    residual confined to one half (lossless at QP 4-ish low energy)."""
    rng = np.random.default_rng(0)
    for idx in (1, 2, 3, 4):
        s = 16
        x0, y0, w, h = transform.sbt_region(idx, s)
        resi = np.zeros((s, s), np.int32)
        resi[y0:y0 + h, x0:x0 + w] = rng.integers(-40, 40, (h, w))
        sel, lev = transform.choose_sbt(resi, qp=22, bd=8)
        assert sel == idx, f"idx {idx}: chose {sel}"
        rec = transform.sbt_reconstruct(lev, sel, qp=22, bd=8)
        # zero outside the transformed half by construction
        mask = np.ones((s, s), bool)
        mask[y0:y0 + h, x0:x0 + w] = False
        assert not rec[mask].any()
        # and a much better approximation than dropping the residual
        assert ((resi - rec) ** 2).sum() < (resi ** 2).sum() // 4


def half_residual_planes(n, h, w, seed=0):
    """Static scene with new texture appearing in the right half of each
    frame: inter residual is confined to one side, the SBT showcase."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 120, (h, w)).astype(np.int32)
    frames = []
    for t in range(n):
        y = base.copy()
        # fresh half-width stripe the reference cannot predict
        y[:, w // 2:] = np.clip(
            base[:, w // 2:] + rng.integers(-60, 60, (h, w // 2)), 0, 255)
        cb = np.full((h // 2, w // 2), 123, np.int32)
        cr = np.full((h // 2, w // 2), 131, np.int32)
        frames.append([y, cb, cr])
    return frames


def test_sbt_forced_roundtrip():
    frames = half_residual_planes(3, 64, 96, seed=5)
    cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False,
                                 intra_period=0, gop=2, sbt=True)
    data, recons, _ = sequence.encode_sequence(list(frames), cfg)
    out, sps = sequence.decode_sequence(data)
    assert sps.sbt_enabled
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_sbt_search_fires_and_saves_bits():
    # qp 27: at qp 30 the r5 spec-literal DCT2 default shifted the RD
    # enough that SBT never won on this clip (mechanism unchanged —
    # this test pins that the search CAN fire, not a rate threshold)
    frames = half_residual_planes(4, 64, 96, seed=9)
    decs = {}
    bits = {}
    for flag in (False, True):
        cfg = sequence.EncoderConfig(qp=27, sao=False, deblock=False,
                                     intra_period=0, gop=3, sbt=flag)
        out = []
        _, _, b = sequence.encode_sequence(list(frames), cfg,
                                           decisions_out=out)
        decs[flag] = out
        bits[flag] = sum(x for x in b if x)
    fired = sum(int((d.sbt8 > 0).sum()) for d in decs[True])
    assert fired > 0
    # RD-selected SBT must not lose to the full transform overall
    assert bits[True] <= int(bits[False] * 1.02)


def test_sbt_pipeline_parity():
    from vvctpu.pipeline import encoder as jenc
    frames = half_residual_planes(5, 64, 128, seed=17)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=4, sbt=True,
                                 mmvd=True, ciip=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)
