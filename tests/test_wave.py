"""Wavefront engine (pipeline/wave.py) vs the sequential scan: bit-exact.

The wave engine re-executes phase B as dependency-levelled vmapped batches;
these tests pin (a) schedule validity and (b) recon/levels parity with
recon.frame_scan on full-toolset AI and B frames.  End-to-end byte parity
with the spec engine is separately enforced by the whole existing suite,
which now runs the pipeline through frame_wave.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vvctpu.coding import decide as jdecide  # noqa: E402
from vvctpu.pipeline import encoder as jenc  # noqa: E402
from vvctpu.pipeline import recon, wave  # noqa: E402
from vvctpu.spec import codec as scodec  # noqa: E402
from vvctpu.spec import sequence as sseq  # noqa: E402
from vvctpu.spec.transform import lambda_rd_int  # noqa: E402

from test_codec_roundtrip import synth_frame  # noqa: E402


def _ai_setup(w, h, seed, qp=32):
    planes = synth_frame(h, w, seed=seed)
    cfg = sseq.EncoderConfig(qp=qp)
    sps = cfg.make_sps(w, h)
    padded = scodec.pad_planes(planes, sps)
    dec = jdecide.decide_frame(padded[0], qp, cfg.bit_depth,
                               mip=sps.mip_enabled, mrl=sps.mrl_enabled,
                               isp=sps.isp_enabled, mtt=sps.mtt_enabled,
                               ibc=sps.ibc_enabled, tt=sps.tt_enabled,
                               plt=sps.plt_enabled)
    return planes, cfg, sps, padded, dec


class TestSchedule:
    def test_covers_all_leaves_and_deps(self):
        _, cfg, sps, padded, dec = _ai_setup(128, 64, seed=3)
        slots = recon.make_slots(dec, sps.height, sps.width)
        sched = wave.build_schedule(slots, sps.height, sps.width)
        want = {(int(r[1]), int(r[2]))
                for r in slots if wave._op_class(int(r[0]),
                                                 int(r[15])) is not None}
        got = set()

        # coding-order key per granule: CTU raster, Morton (Z) within.
        def _key(gy, gx):
            cy, cx = gy // 8, gx // 8
            ly, lx = gy % 8, gx % 8
            m = 0
            for i in range(3):
                m |= (((ly >> i) & 1) << (2 * i + 1)
                      | ((lx >> i) & 1) << (2 * i))
            return ((cy * (sps.width // 64) + cx) << 6) | m

        # dependency rule: a leaf's reference reads (top row incl.
        # top-right extension, left column incl. below-left extension)
        # that PRECEDE it in coding order must already be reconstructed
        # — availability masking makes later granules a non-dependency
        # (the sequential engine also treats them as unavailable).
        done = np.zeros((sps.height // 8, sps.width // 8), bool)
        ngy, ngx = sps.height // 8, sps.width // 8
        for cls, rows in sched:
            kind, w, h, _ = cls
            for r in rows:
                x, y = int(r[1]), int(r[2])
                got.add((x, y))
                k0 = _key(y // 8, x // 8)
                reads = []
                gy = y // 8 - 1
                if gy >= 0:
                    for gx in range(max((x - 8) // 8, 0),
                                    min((x + w + h - 1) // 8, ngx - 1) + 1):
                        reads.append((gy, gx))
                gx = x // 8 - 1
                if gx >= 0:
                    for gy2 in range(max((y - 8) // 8, 0),
                                     min((y + h + w - 1) // 8, ngy - 1) + 1):
                        reads.append((gy2, gx))
                for (ry_, rx_) in reads:
                    if _key(ry_, rx_) < k0:
                        assert done[ry_, rx_], (
                            f"leaf ({x},{y},{w}x{h}) scheduled before its "
                            f"producer granule ({rx_ * 8},{ry_ * 8})")
            # mark the whole batch done only after checking every leaf
            # (batch-internal leaves must not depend on each other)
            for r in rows:
                x, y = int(r[1]), int(r[2])
                done[y // 8:(y + h - 1) // 8 + 1,
                     x // 8:(x + w - 1) // 8 + 1] = True
        # batch-internal independence: no two leaves in one batch overlap
        for cls, rows in sched:
            w, h = cls[1], cls[2]
            seen = set()
            for r in rows:
                for yy in range(int(r[2]) // 8, (int(r[2]) + h) // 8):
                    for xx in range(int(r[1]) // 8, (int(r[1]) + w) // 8):
                        assert (yy, xx) not in seen
                        seen.add((yy, xx))
        assert got == want

    def test_wave_count_sublinear(self):
        _, cfg, sps, padded, dec = _ai_setup(192, 128, seed=5)
        slots = recon.make_slots(dec, sps.height, sps.width)
        sched = wave.build_schedule(slots, sps.height, sps.width)
        n_leaves = sum(rows.shape[0] for _, rows in sched)
        assert len(sched) < n_leaves  # batching actually happens


class TestWaveParity:
    @pytest.mark.parametrize("seed,qp", [(1, 32), (7, 27)])
    def test_ai_frame_parity(self, seed, qp):
        _, cfg, sps, padded, dec = _ai_setup(128, 64, seed=seed, qp=qp)
        slots = recon.make_slots(dec, sps.height, sps.width)
        kw = dict(frame_w=sps.width, frame_h=sps.height, qp=qp,
                  bd=cfg.bit_depth, encode=True, mts=sps.mts_enabled,
                  lfnst=sps.lfnst_enabled, cclm=sps.cclm_enabled,
                  rdoq=cfg.rdoq, mip=sps.mip_enabled, tskip=sps.ts_enabled,
                  jccr=sps.jccr_enabled, isp=sps.isp_enabled,
                  mtt=sps.mtt_enabled, ibc=sps.ibc_enabled,
                  dq=sps.dq_enabled, lam_rd=lambda_rd_int(qp))
        ref = recon.frame_scan(slots, padded[0], padded[1], padded[2], **kw)
        got = wave.frame_wave(slots, padded[0], padded[1], padded[2], **kw)
        for i, (a, b) in enumerate(zip(ref, got)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), f"out {i}"

    def test_ai_sequence_bytes(self):
        planes = synth_frame(96, 128, seed=11)
        cfg = sseq.EncoderConfig(qp=32)
        import os
        d_serial, r_serial, _ = jenc.encode_sequence([planes], cfg)
        os.environ["VVCTPU_WAVE"] = "1"
        try:
            d_wave, r_wave, _ = jenc.encode_sequence([planes], cfg)
        finally:
            del os.environ["VVCTPU_WAVE"]
        assert d_wave == d_serial
        for c in range(3):
            assert np.array_equal(r_wave[0][c], r_serial[0][c])

    def test_b_sequence_bytes(self):
        frames = [synth_frame(64, 128, seed=20 + t) for t in range(3)]
        cfg = sseq.EncoderConfig(qp=30, intra_period=8, gop=2)
        import os
        d_serial, _, _ = jenc.encode_sequence(frames, cfg)
        os.environ["VVCTPU_WAVE"] = "1"
        try:
            d_wave, _, _ = jenc.encode_sequence(frames, cfg)
        finally:
            del os.environ["VVCTPU_WAVE"]
        assert d_wave == d_serial
        out, _ = jenc.decode_sequence(d_wave, check_hash=True)
        assert len(out) == 3
