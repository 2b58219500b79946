"""Inter path: MC kernel parity, ME parity, P-frame pipeline bitstreams."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vvctpu.spec import inter as sinter  # noqa: E402
from vvctpu.kernels import mc as jmc  # noqa: E402

from test_codec_roundtrip import synth_frame  # noqa: E402


def motion_frames(n=3, h=64, w=96, seed=30):
    base = synth_frame(h, w, seed=seed)
    out = []
    for t in range(n):
        y = np.roll(base[0], (2 * t, 3 * t), axis=(0, 1))
        cb = np.roll(base[1], (t, t), axis=(0, 1))
        cr = np.roll(base[2], (t, t), axis=(0, 1))
        out.append([y, cb, cr])
    return out


class TestMcParity:
    @pytest.mark.parametrize("s", [8, 16, 32])
    def test_luma_all_phase_classes(self, s):
        rng = np.random.default_rng(s)
        ref = rng.integers(0, 256, (96, 96)).astype(np.int32)
        refp = sinter.pad_reference(ref)
        jref = jnp.asarray(refp)
        for mvx, mvy in [(0, 0), (16, -32), (5, 0), (0, -7), (13, 29),
                        (-100, 50), (33, -33), (1, 1)]:
            want = sinter.mc_luma(refp, 16, 16, s, s, mvx, mvy)
            got = np.asarray(jmc.mc_luma_block(jref, 16, 16, s, mvx, mvy))
            assert np.array_equal(got, want), (s, mvx, mvy)

    @pytest.mark.parametrize("s", [4, 8, 16])
    def test_chroma_all_phase_classes(self, s):
        rng = np.random.default_rng(100 + s)
        ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
        refp = sinter.pad_reference(ref, sinter.REF_MARGIN // 2)
        jref = jnp.asarray(refp)
        for mvx, mvy in [(0, 0), (32, -64), (5, 0), (0, -7), (13, 29),
                        (-50, 21)]:
            want = sinter.mc_chroma(refp, 8, 8, s, s, mvx, mvy,
                                    margin=sinter.REF_MARGIN // 2)
            got = np.asarray(jmc.mc_chroma_block(jref, 8, 8, s, mvx, mvy))
            assert np.array_equal(got, want), (s, mvx, mvy)


class TestMeParity:
    def test_me_maps_match_spec(self):
        from vvctpu.coding import me as jme
        from vvctpu.spec import decide as sdecide
        rng = np.random.default_rng(7)
        h, w = 64, 64
        orig = rng.integers(0, 256, (h, w)).astype(np.int32)
        ref = np.roll(orig, (3, -5), axis=(0, 1)).astype(np.int32)
        lam = sdecide.lambda_satd_fp(32)
        refp = np.pad(ref, sinter.REF_MARGIN, mode="edge")
        maps = jme.me_pass(jnp.asarray(orig), jnp.asarray(refp),
                           np.int64(lam), frame_w=w, frame_h=h)
        for s in (8, 16, 32):
            scost, smv = sdecide.me_size_pass(orig, ref, s, lam)
            assert np.array_equal(np.asarray(maps[s][0]), scost), s
            assert np.array_equal(np.asarray(maps[s][1]), smv), s


class TestPFramePipeline:
    def test_decide_p_parity(self):
        from vvctpu.coding import decide as jdecide
        from vvctpu.spec import decide as sdecide
        frames = motion_frames()
        orig, ref = frames[1][0], frames[0][0]
        # pad to CTU multiple (96 wide -> 128)
        from vvctpu.spec import codec as scodec, sequence as seq
        sps = seq.EncoderConfig().make_sps(96, 64)
        po = scodec.pad_planes(frames[1], sps)[0]
        pr = scodec.pad_planes(frames[0], sps)[0]
        sdec = sdecide.decide_frame_p(po, pr, 32)
        jdec = jdecide.decide_frame_p(po, pr, 32)
        assert sdec.equal(jdec)

    def test_bitstream_identical_ippp(self):
        from vvctpu.spec import sequence as sseq
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames()
        cfg = sseq.EncoderConfig(qp=32, intra_period=0)
        sdata, srec, sbits = sseq.encode_sequence(frames, cfg)
        jdata, jrec, jbits = jenc.encode_sequence(frames, cfg)
        assert jdata == sdata
        for i in range(len(frames)):
            for c in range(3):
                assert np.array_equal(jrec[i][c], srec[i][c])

    def test_cross_decode(self):
        from vvctpu.spec import sequence as sseq
        from vvctpu.pipeline import encoder as jenc
        frames = motion_frames(seed=31)
        cfg = sseq.EncoderConfig(qp=35, intra_period=0)
        sdata, srec, _ = sseq.encode_sequence(frames, cfg)
        out, _ = jenc.decode_sequence(sdata, check_hash=True)
        for i in range(len(frames)):
            for c in range(3):
                assert np.array_equal(out[i][c], srec[i][c])
