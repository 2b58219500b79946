"""LMCS luma mapping: model/LUT properties, roundtrips, engine parity."""
import numpy as np
import pytest

from vvctpu.spec import lmcs
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


class TestModel:
    def test_uniform_content_identity_model(self):
        y = np.full((64, 64), 100, np.int32)
        cw = lmcs.derive_model(y)
        assert sum(cw) == 256
        fwd, inv = lmcs.build_luts(cw)
        assert fwd.shape == (256,) and inv.shape == (256,)

    def test_model_sums_to_range(self):
        rng = np.random.default_rng(30)
        for seed in range(3):
            y = rng.integers(0, 256, (64, 64)).astype(np.int32)
            cw = lmcs.derive_model(y)
            assert sum(cw) == 256
            assert all(16 // 4 <= v <= 32 for v in cw)

    def test_fwd_monotone_inv_tight(self):
        rng = np.random.default_rng(31)
        y = np.clip(rng.normal(128, 30, (128, 128)), 0,
                    255).astype(np.int32)
        cw = lmcs.derive_model(y)
        fwd, inv = lmcs.build_luts(cw)
        assert (np.diff(fwd) >= 0).all()
        x = np.arange(256)
        err = np.abs(inv[fwd[x]] - x)
        assert err.max() <= 2       # piecewise-linear integer roundtrip

    def test_model_syntax_roundtrip(self):
        from vvctpu.core import bitstream as bs
        cw = (10, 20, 16, 16, 16, 16, 30, 4, 16, 16, 16, 16, 16, 16, 16,
              32)
        w = bs.BitWriter()
        lmcs.code_model(w, cw)
        w.byte_align()
        r = bs.BitReader(w.getvalue())
        assert lmcs.parse_model(r) == cw


class TestStream:
    def test_ai_roundtrip_lmcs(self):
        frames = motion_frames(2, 64, 96, seed=70)
        cfg = seq.EncoderConfig(qp=32, intra_period=1, lmcs=True)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(2):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_inter_roundtrip_lmcs(self):
        frames = motion_frames(4, 64, 96, seed=71)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=2, lmcs=True)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        for i in range(4):
            for c in range(3):
                assert np.array_equal(out[i][c], recons[i][c])

    def test_engines_identical_lmcs(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(3, 64, 96, seed=72)
        cfg = seq.EncoderConfig(qp=32, intra_period=0, gop=1, lmcs=True)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        jout, _ = jenc.decode_sequence(sdata)
        sout, _ = seq.decode_sequence(sdata)
        for a, b in zip(jout, sout):
            for c in range(3):
                assert np.array_equal(a[c], b[c])

    def test_engines_identical_everything_on(self):
        pytest.importorskip("jax")
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(3, 64, 96, seed=73)
        cfg = seq.EncoderConfig(qp=35, intra_period=0, gop=2, lmcs=True,
                                mts=True, lfnst=True, cclm=True, alf=True,
                                wpp=False)
        sdata, _, _ = seq.encode_sequence(frames, cfg)
        jdata, _, _ = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata


def test_crs_lut_properties():
    """CRS scale LUT: identity model -> unity slope everywhere; slopes
    follow the codeword allocation and honour the [1/4x, 4x] clamp."""
    import numpy as np
    from vvctpu.spec import lmcs
    ident = (16,) * 16
    lut = lmcs.build_crs_lut(ident, 8)
    assert (lut == 1 << lmcs.SCALE_SHIFT).all()
    skew = (4,) * 8 + (28,) * 8          # sums to 256
    lut = lmcs.build_crs_lut(skew, 8)
    assert lut.min() >= lmcs.CRS_MIN and lut.max() <= lmcs.CRS_MAX
    # fwd/inv are inverse-ish: inv(fwd(x)) within one step of x
    rng = np.random.default_rng(0)
    res = rng.integers(-200, 200, (8, 8)).astype(np.int32)
    for sc in (512, 1024, 2048, 4096, 8192):
        back = lmcs.crs_inv(lmcs.crs_fwd(res, sc), sc)
        assert np.abs(back - res).max() <= max(1, sc >> lmcs.SCALE_SHIFT)


def test_crs_inter_roundtrip_and_parity():
    """Inter frames under LMCS exercise chroma residual scaling: hash-
    verified roundtrip and byte parity between engines, with chroma
    content that actually produces residuals."""
    import numpy as np
    from vvctpu.pipeline import encoder as jenc
    from vvctpu.spec import sequence
    rng = np.random.default_rng(31)
    h, w = 64, 96
    ybase = rng.integers(10, 240, (h, w * 2)).astype(np.int32)
    frames = []
    for t in range(3):
        y = ybase[:, t * 2:t * 2 + w]
        cb = (128 + 30 * np.sin((np.mgrid[0:h // 2, 0:w // 2][1] + 7 * t)
                                / 5.0)).astype(np.int32)
        cr = (128 - 25 * np.cos((np.mgrid[0:h // 2, 0:w // 2][0] - 4 * t)
                                / 6.0)).astype(np.int32)
        frames.append([y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)])
    cfg = sequence.EncoderConfig(qp=30, sao=False, deblock=False,
                                 intra_period=0, gop=2, lmcs=True,
                                 ciip=True, sbt=True)
    ref_stream, recons, _ = sequence.encode_sequence(list(frames), cfg)
    out, sps = sequence.decode_sequence(ref_stream)
    assert sps.lmcs_enabled
    for poc in range(3):
        for a, b in zip(out[poc], recons[poc]):
            assert np.array_equal(a, b)
    got_stream, _, _ = jenc.encode_sequence(list(frames), cfg)
    assert ref_stream == got_stream
    jout, _ = jenc.decode_sequence(got_stream)
    for poc in range(3):
        for a, b in zip(jout[poc], out[poc]):
            assert np.array_equal(a, b)
