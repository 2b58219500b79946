"""CIIP: combined inter-intra prediction (both engines).

Covers SURVEY.md §2.2 CIIP (VTM:CommonLib/InterPrediction.cpp CIIP blend +
ciip_flag syntax, EncCu's CIIP merge candidates): forced-flag roundtrip with
hash verification, the encoder refinement picking CIIP where a gradient makes
the planar blend win, and spec-vs-pipeline byte parity (the JAX CIIP leaves
run sequentially in phase B because they read reconstructed neighbours).
"""
import numpy as np

from vvctpu.spec import sequence
from vvctpu.spec.codec import FrameDecisions


def moving_gradient_planes(n, h, w, seed=0):
    """Flat-DC noise texture (span 48) shifting horizontally, under a
    quadratic global brightness drift (+12t^2): MC tracks the texture but
    carries the DC error (SAD-expensive), the 67 intra modes can't predict
    the noise (SATD-expensive), while the planar blend halves the DC error
    from the CURRENT frame's neighbourhood — the CIIP sweet spot.  The DC
    must be flat so ME can't cancel the drift via a sub-pel shift along a
    gradient."""
    rng = np.random.default_rng(seed)
    base = rng.integers(50, 98, (h, w * 2)).astype(np.int32)
    frames = []
    for t in range(n):
        y = np.clip(base[:, t * 3:t * 3 + w] + t * t * 12, 0, 255)
        cb = np.full((h // 2, w // 2), 118 + 4 * t, np.int32)
        cr = np.full((h // 2, w // 2), 134 - 3 * t, np.int32)
        frames.append([y.astype(np.int32), cb, cr])
    return frames


def test_ciip_forced_roundtrip():
    """Leaves with a forced ciip flag survive encode->decode with hash
    verification in the spec engine (flag coded, blend applied)."""
    frames = moving_gradient_planes(3, 64, 96, seed=3)
    cfg = sequence.EncoderConfig(qp=32, sao=False, deblock=False,
                                 intra_period=0, gop=2, ciip=True)

    def decisions_fn(poc, pl, sps, c):
        dec = FrameDecisions.empty(sps.height, sps.width)
        if poc == 0:
            return dec
        dec.inter8[:] = 1
        dec.dir8[:] = 2 if poc == 1 else 0
        dec.ciip8[:, : dec.ciip8.shape[1] // 2] = 1   # left half CIIP
        return dec

    data, recons, _ = sequence.encode_sequence(list(frames), cfg,
                                               decisions_fn=decisions_fn)
    out, sps = sequence.decode_sequence(data)
    assert sps.ciip_enabled
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)


def test_ciip_search_fires_on_gradient_drift():
    """The decision refinement must select CIIP somewhere on drifting-DC
    content, and decisions must agree between spec and device passes."""
    from vvctpu.coding import decide as jdecide
    from vvctpu.spec import decide as sdecide
    frames = moving_gradient_planes(3, 64, 96, seed=11)
    y0, y1, y2 = (f[0] for f in frames)
    sdec = sdecide.decide_frame_b(y1, y0, y2, qp=34, ciip=True)
    jdec = jdecide.decide_frame_b(y1, y0, y2, qp=34, ciip=True)
    assert sdec.equal(jdec)
    assert int(sdec.ciip8.sum()) > 0


def test_ciip_p_decision_parity():
    from vvctpu.coding import decide as jdecide
    from vvctpu.spec import decide as sdecide
    frames = moving_gradient_planes(2, 64, 64, seed=29)
    sdec = sdecide.decide_frame_p(frames[1][0], frames[0][0], qp=34,
                                  ciip=True)
    jdec = jdecide.decide_frame_p(frames[1][0], frames[0][0], qp=34,
                                  ciip=True)
    assert sdec.equal(jdec)


def test_ciip_pipeline_parity():
    """Byte-identical streams + identical decode across engines with CIIP
    on (exercises the phase-B CIIP leaves incl. merge/AMVP mixes)."""
    from vvctpu.pipeline import encoder as jenc
    frames = moving_gradient_planes(5, 64, 128, seed=17)
    cfg = sequence.EncoderConfig(qp=34, sao=False, deblock=False,
                                 intra_period=0, gop=4, ciip=True,
                                 mmvd=True, bcw=True)
    ref_stream, _, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = jenc.decode_sequence(got_stream)
    ref_out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(5):
        for a, b in zip(out[poc], ref_out[poc]):
            assert np.array_equal(a, b)


def test_ciip_with_lmcs_and_filters_parity():
    """CIIP under LMCS (mapped-domain blend) + deblock/SAO, both engines."""
    from vvctpu.pipeline import encoder as jenc
    frames = moving_gradient_planes(3, 64, 64, seed=23)
    cfg = sequence.EncoderConfig(qp=32, intra_period=0, gop=2, ciip=True,
                                 lmcs=True, sao=True, deblock=True)
    ref_stream, recons, _ = sequence.encode_sequence(list(frames), cfg)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    out, _ = sequence.decode_sequence(ref_stream)
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)
