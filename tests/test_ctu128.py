"""CTU 128 (r5, VERDICT ask #1 part): implicit QT to the 64-px quads,
z-order coding walk, WPP/SAO/tile granularity at 128.

Both engines must stay byte-identical to each other and self-consistent
(hash-verified) at either CTU size; 64 must be bit-identical to the
pre-r5 build (z-order == raster at the 2x2 level).
"""
import numpy as np
import pytest

from vvctpu.spec import sequence as sseq


def _frames(n, h, w, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (90 + 70 * np.sin((xx + 5 * t) / 11.0)
             + 50 * np.cos((yy - 3 * t) / 8.0)
             + rng.integers(-8, 8, (h, w))).clip(0, 255).astype(np.int32)
        cb = np.full((h // 2, w // 2), 120, np.int32)
        cr = (128 + 20 * np.sin(yy[::2, ::2] / 9.0)).astype(np.int32)
        out.append([y, cb, cr])
    return out


def _roundtrip(frames, cfg):
    data, recons, _ = sseq.encode_sequence(frames, cfg)
    out, _ = sseq.decode_sequence(data, check_hash=True)
    for i in range(len(frames)):
        assert np.array_equal(out[i][0], recons[i][0])
    jax = pytest.importorskip("jax")
    from vvctpu.pipeline import encoder as jenc
    jdata, _, _ = jenc.encode_sequence(frames, cfg)
    assert jdata == data, "engine streams differ"
    jout, _ = jenc.decode_sequence(jdata, check_hash=True)
    for i in range(len(frames)):
        assert np.array_equal(jout[i][0], out[i][0])
    return data


def test_ai_ctu128_roundtrip():
    frames = _frames(1, 140, 190)        # pads to 256x256 at CTU 128
    _roundtrip(frames, sseq.EncoderConfig(qp=32, ctu=128, mts=True))


def test_ctu_sizes_differ_but_both_decode():
    frames = _frames(1, 128, 192)
    d64 = _roundtrip(frames, sseq.EncoderConfig(qp=30, ctu=64))
    d128 = _roundtrip(frames, sseq.EncoderConfig(qp=30, ctu=128))
    assert d64 != d128                    # different walk/WPP granularity


def test_inter_ctu128_gop():
    frames = _frames(3, 128, 192, seed=11)
    _roundtrip(frames, sseq.EncoderConfig(qp=32, ctu=128, intra_period=0,
                                          gop=2))


def test_wpp_ctu128():
    frames = _frames(1, 256, 192, seed=12)
    _roundtrip(frames, sseq.EncoderConfig(qp=32, ctu=128, wpp=True))


def test_mtt_ctu128():
    frames = _frames(1, 128, 192, seed=13)
    _roundtrip(frames, sseq.EncoderConfig(qp=32, ctu=128, mtt=True,
                                          tt=True, isp=True))


@pytest.mark.quick
def test_ibc_gated():
    with pytest.raises(ValueError):
        sseq.EncoderConfig(ctu=128, ibc=True).make_sps(64, 64)
