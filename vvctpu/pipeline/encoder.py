"""JAX pipeline encoder/decoder: device scans + host entropy + NAL assembly.

The fast-engine counterpart of spec/sequence.py; bitstreams are byte-identical
to the spec encoder's (enforced by tests/test_pipeline_parity.py), so the two
engines are interchangeable per stream.
"""
from __future__ import annotations

import numpy as np

from ..coding import decide as jdecide


def jnp_asarray(a):
    import jax.numpy as jnp
    return jnp.asarray(a)
from ..core import bitstream as bs
from ..spec import codec as scodec
from ..spec import hls
from ..spec import sequence as sseq
from . import entropy, recon


def _scan_fn():
    """Phase-B executor: the fused wavefront engine by default (one jit
    per geometry/toolset, lax.scan over dependency-wave chunks —
    pipeline/wave.py) — byte-identical to the sequential lax.scan engine
    (tests/test_wave.py).  VVCTPU_SERIAL_SCAN=1 forces the serial engine
    for A/B runs; VVCTPU_WAVE_BATCH=1 selects the legacy per-batch
    dispatch driver inside frame_wave."""
    import os
    if os.environ.get("VVCTPU_SERIAL_SCAN"):
        return recon.frame_scan
    from . import wave
    return wave.frame_wave


def _run_scan(sps, pps, dec, py, pcb, pcr, dpb, ref_pocs, scan_kw,
              fetch: bool = True):
    """frame_scan over the whole frame, or one scan per tile with MC
    reference offsets (tile-local slots; MC reads the full reference).
    Returns (ry, rcb, rcr, ly, lcb, lcr, mts, lfnst, cmode, jccr, sbt)
    as numpy arrays (fetch=False: device arrays, single-tile only —
    device-resident pipeline).  dpb values are DEVICE ref 3-tuples
    (recon.pad_refs_dev)."""
    is_p = bool(ref_pocs)
    mtt = scan_kw.get("mtt", False)

    def refs_kw():
        if not is_p:
            return {}
        r0 = dpb[ref_pocs[0]]
        kw = dict(ref_y=r0[0], ref_cb=r0[1], ref_cr=r0[2])
        if len(ref_pocs) == 2:
            r1 = dpb[ref_pocs[1]]
            kw.update(ref1_y=r1[0], ref1_cb=r1[1], ref1_cr=r1[2])
        return kw

    rkw = refs_kw()
    plt_full = {k: scan_kw.pop(k) for k in ("plt_y", "plt_cb", "plt_cr")
                if k in scan_kw}
    n_tiles = pps.num_tile_cols * pps.num_tile_rows
    if n_tiles == 1:
        rkw.update(plt_full)
        if is_p:
            slots, isl = recon.make_slots_split(dec, sps.height, sps.width, 1 << sps.log2_ctu)
            rkw.update(inter8=isl[8], inter16=isl[16], inter32=isl[32])
            if mtt:
                rkw.update(rect16x8=isl[(16, 8)], rect8x16=isl[(8, 16)],
                           rect32x16=isl[(32, 16)],
                           rect16x32=isl[(16, 32)],
                           rect32x8=isl[(32, 8)], rect8x32=isl[(8, 32)])
        else:
            slots = recon.make_slots(dec, sps.height, sps.width, 1 << sps.log2_ctu)
        out = _scan_fn()(slots, py, pcb, pcr, frame_w=sps.width,
                         frame_h=sps.height, inter_enabled=is_p,
                         **rkw, **scan_kw)
        if not fetch:
            return list(out)
        from ..core import xfer
        return xfer.device_get(list(out))

    from ..spec.codec import tile_decisions_view
    ctu = 1 << sps.log2_ctu
    n_x, n_y = sps.width // ctu, sps.height // ctu
    rects = hls.tile_grid(n_x, n_y, pps.num_tile_cols, pps.num_tile_rows)
    H, W = sps.height, sps.width
    outs = [np.zeros((H, W), np.int32), np.zeros((H // 2, W // 2), np.int32),
            np.zeros((H // 2, W // 2), np.int32),
            np.zeros((H, W), np.int32), np.zeros((H // 2, W // 2), np.int32),
            np.zeros((H // 2, W // 2), np.int32)] + \
        [np.zeros((H // 8, W // 8), np.int32) for _ in range(5)]

    def tile_prep(rect):
        cx0, cy0, cx1, cy1 = rect
        x0, y0, x1, y1 = cx0 * ctu, cy0 * ctu, cx1 * ctu, cy1 * ctu
        tw, th = x1 - x0, y1 - y0
        tdec = tile_decisions_view(dec, x0, y0, x1, y1)
        tkw = dict(rkw)
        if plt_full:
            tkw.update(
                plt_y=plt_full["plt_y"][y0:y1, x0:x1],
                plt_cb=plt_full["plt_cb"][y0 // 2:y1 // 2, x0 // 2:x1 // 2],
                plt_cr=plt_full["plt_cr"][y0 // 2:y1 // 2, x0 // 2:x1 // 2])
        if is_p:
            slots, isl = recon.make_slots_split(tdec, th, tw, 1 << sps.log2_ctu)
            tkw.update(inter8=isl[8], inter16=isl[16], inter32=isl[32])
            if mtt:
                tkw.update(rect16x8=isl[(16, 8)], rect8x16=isl[(8, 16)],
                           rect32x16=isl[(32, 16)],
                           rect16x32=isl[(16, 32)],
                           rect32x8=isl[(32, 8)], rect8x32=isl[(8, 32)])
        else:
            slots = recon.make_slots(tdec, th, tw, 1 << sps.log2_ctu)
            isl = None
        return (x0, y0, x1, y1, tw, th, slots, isl, tkw)

    preps = [tile_prep(r) for r in rects]

    def write_outs(x0, y0, x1, y1, res):
        for i, a in enumerate(res):
            a = np.asarray(a)
            g = 1 if i in (0, 3) else 2 if i in (1, 2, 4, 5) else 8
            outs[i][y0 // g:y1 // g, x0 // g:x1 // g] = a

    from ..dist import shard
    mesh = shard.active_mesh()
    sizes = {(p[4], p[5]) for p in preps}
    import os
    if (mesh is not None and len(sizes) == 1
            and len(preps) == int(mesh.shape["tile"])
            and not os.environ.get("VVCTPU_SERIAL_SCAN")):
        # tile-sharded path: all tiles execute concurrently over the mesh
        # 'tile' axis (byte-identical to the sequential loop below)
        tw, th = preps[0][4], preps[0][5]
        from ..pipeline import plan as planmod
        tiles = []
        for (x0, y0, x1, y1, _, _, slots, isl, tkw) in preps:
            tiles.append(dict(
                slots=slots,
                py=py[y0:y1, x0:x1],
                pcb=pcb[y0 // 2:y1 // 2, x0 // 2:x1 // 2],
                pcr=pcr[y0 // 2:y1 // 2, x0 // 2:x1 // 2],
                rox=x0, roy=y0,
                inter={s: isl[s] for s in (8, 16, 32)} if is_p else None,
                rect=({sh: isl[sh] for sh in planmod.RECT_SHAPES}
                      if (is_p and mtt) else None),
                plt=((tkw["plt_y"], tkw["plt_cb"], tkw["plt_cr"])
                     if "plt_y" in tkw else None)))
        refs6 = None
        if is_p:
            refs6 = (rkw["ref_y"], rkw["ref_cb"], rkw["ref_cr"],
                     rkw.get("ref1_y", rkw["ref_y"]),
                     rkw.get("ref1_cb", rkw["ref_cb"]),
                     rkw.get("ref1_cr", rkw["ref_cr"]))
        results = shard.sharded_tile_scan(mesh, tiles, tw, th, refs6,
                                          dict(scan_kw))
        for (x0, y0, x1, y1, *_), res in zip(preps, results):
            write_outs(x0, y0, x1, y1, res)
        return outs

    for (x0, y0, x1, y1, tw, th, slots, isl, tkw) in preps:
        res = _scan_fn()(
            slots, py[y0:y1, x0:x1], pcb[y0 // 2:y1 // 2, x0 // 2:x1 // 2],
            pcr[y0 // 2:y1 // 2, x0 // 2:x1 // 2], frame_w=tw, frame_h=th,
            inter_enabled=is_p, ref_off_x=x0, ref_off_y=y0, **tkw,
            **scan_kw)
        write_outs(x0, y0, x1, y1, res)
    return outs


def _encode_ai_batched(frames, cfg, sps, pps, nals, recons, bits,
                       decisions_out=None):
    """All-intra encode with FRAME-BATCHED wavefront execution.

    Groups of F independent I-frames run as ONE merged wave scan
    (pipeline/wave.frame_wave_batch): the intra dependency chain caps a
    single frame's wave anti-chains at ~10-20 leaves, so batching F frames
    multiplies per-step occupancy F-fold at the same step count — the
    TPU-first answer to VVC's serial intra dependencies.  Per-frame loop
    filters chain on device; the next group's decision passes are enqueued
    before this group's host entropy runs.  Byte-identical stream to the
    sequential path (decisions, scans and filters are per-frame identical;
    tests/test_pipeline_parity.py)."""
    from ..kernels import loopfilter as lfk
    from ..spec.transform import lambda_rd_int
    from . import wave
    qp = cfg.qp
    bdepth = cfg.bit_depth
    lam_sao = int(round(0.57 * (2.0 ** ((qp - 12) / 3.0)) * 256.0))
    n = len(frames)
    FB = 8 if sps.width * sps.height >= (1 << 20) else 4
    scan_kw = dict(qp=qp, bd=bdepth, encode=True, mts=sps.mts_enabled,
                   lfnst=sps.lfnst_enabled, cclm=sps.cclm_enabled,
                   rdoq=cfg.rdoq, mip=sps.mip_enabled,
                   tskip=sps.ts_enabled, jccr=sps.jccr_enabled,
                   isp=sps.isp_enabled, mtt=sps.mtt_enabled,
                   ibc=sps.ibc_enabled, dq=sps.dq_enabled,
                   lam_rd=lambda_rd_int(qp))

    def start_group(g0):
        grp = list(range(g0, min(n, g0 + FB)))
        padded_l = [scodec.pad_planes(frames[p], sps) for p in grp]
        hds = [jdecide.decide_frame_device(pl[0], qp, bdepth,
                                           mip=sps.mip_enabled,
                                           mrl=sps.mrl_enabled,
                                           isp=sps.isp_enabled,
                                           mtt=sps.mtt_enabled,
                                           ibc=sps.ibc_enabled,
                                           tt=sps.tt_enabled,
                                           plt=sps.plt_enabled)
               for pl in padded_l]
        return grp, padded_l, hds

    pending_group = start_group(0)
    g0 = 0
    while g0 < n:
        grp, padded_l, hds = pending_group
        fin, decs = [], []
        for i, poc in enumerate(grp):
            dec = jdecide.decide_frame_assemble(hds[i])
            decs.append(dec)
            if decisions_out is not None:
                decisions_out.append(dec)
            pltpl = None
            if sps.plt_enabled:
                from ..spec import palette as pltmod
                pltmod.derive_plt_data(dec, padded_l[i][0], padded_l[i][1],
                                       padded_l[i][2], bdepth)
                pltpl = pltmod.build_planes(dec.plt_data or {}, sps.height,
                                            sps.width)
            slots = recon.make_slots(dec, sps.height, sps.width, 1 << sps.log2_ctu)
            fin.append(dict(slots=slots, py=padded_l[i][0],
                            pcb=padded_l[i][1], pcr=padded_l[i][2],
                            plt=pltpl))
        outs = wave.frame_wave_batch(fin, frame_w=sps.width,
                                     frame_h=sps.height, **scan_kw)
        chains = [lfk.finish_frame_j(
            [outs[i][0], outs[i][1], outs[i][2]], decs[i], qp, lam_sao,
            padded_l[i], inv_lut=None, ctu=cfg.ctu, bd=bdepth,
            deblock_on=sps.deblock_enabled, sao_on=sps.sao_enabled)
            for i in range(len(grp))]
        if g0 + FB < n:      # overlap: next group's decides on device now
            pending_group = start_group(g0 + FB)
        for i, poc in enumerate(grp):
            from ..core import xfer
            fetched = xfer.device_get(list(outs[i][3:]) + list(chains[i]))
            (ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp, sbtp,
             cy, ccb, ccr, sao_t, sao_o, sao_b) = fetched
            dec = decs[i]
            levels = [ly, lcb, lcr]
            if sps.mts_enabled or sps.ts_enabled:
                # TS rides the unified tx index (5): the plane must be
                # copied whenever the scan ran the tx RD — gating on
                # mts_enabled alone dropped the signalled index for
                # tskip-without-mts configs (pre-round-4 latent bug: the
                # writer then coded idx 0 over TS-quantised levels and
                # every decoder reconstructed garbage)
                dec.mts8[:] = mtsp.astype(np.uint8)
            if sps.lfnst_enabled:
                dec.lfnst8[:] = lfnstp.astype(np.uint8)
            if sps.cclm_enabled:
                dec.cmode8[:] = cmodep.astype(np.uint8)
            if sps.jccr_enabled:
                dec.jccr8[:] = jccrp.astype(np.uint8)
            if sps.sbt_enabled:
                dec.sbt8[:] = sbtp.astype(np.uint8)
            sh = hls.SliceHeader(poc=poc, slice_type=hls.SLICE_I,
                                 qp_delta=0, ref_pocs=(), lmcs_cw=())
            rec = [cy, ccb, ccr]
            sao_params = None
            if sps.sao_enabled:
                from ..spec.sao import SaoParams
                sao_params = SaoParams(type=sao_t.astype(np.int32),
                                       offsets=sao_o.astype(np.int32),
                                       band_pos=sao_b.astype(np.int32))
            alf_params = None
            if sps.alf_enabled:
                from ..spec import alf as alfmod
                alf_params = alfmod.derive_alf_frame(padded_l[i], rec, qp,
                                                     cfg.ctu, bdepth)
                rec = lfk.apply_alf_frame_j(rec, alf_params, cfg.ctu,
                                            bdepth)
            payload = entropy.encode_frame_syntax(sps, pps, sh, dec,
                                                  levels, sao_params,
                                                  alf_params)
            cropped = scodec.crop_planes(rec, sps)
            nals.append(bs.NalUnit(bs.NAL_IDR_N_LP, payload, temporal_id=0))
            nals.append(bs.NalUnit(
                bs.NAL_SUFFIX_SEI,
                hls.write_pic_hash_sei(cropped, bdepth, cfg.hash_type),
                temporal_id=0))
            recons[poc] = cropped
            bits[poc] = 8 * len(payload)
        g0 += FB
    return bs.write_annexb(nals), recons, bits


def _encode_ai_pipelined(frames, cfg, sps, pps, nals, recons, bits,
                         decisions_out=None):
    """All-intra encode with a decide-ahead device/host pipeline.

    AI frames are independent, so frame i+1's decision pass is dispatched
    a full cycle early; the post-reconstruction chain (LMCS inverse ->
    deblock -> SAO decide + apply) runs ON DEVICE chained behind the
    reconstruction scan (kernels/loopfilter.finish_frame_j), and finish()
    fetches everything for a frame in ONE tunnel round trip before doing
    the host-only entropy + NAL work while the device churns frame i+1.
    Byte-identical stream to the sequential path."""
    import jax

    from ..kernels import loopfilter as lfk
    from ..spec.transform import lambda_rd_int
    qp = cfg.qp
    lam_sao = int(round(0.57 * (2.0 ** ((qp - 12) / 3.0)) * 256.0))
    pending = None

    def start_decide(poc):
        padded = scodec.pad_planes(frames[poc], sps)
        lmcs_cw = ()
        fwd_lut = inv_lut = crs_lut = None
        scan_y = padded[0]
        if sps.lmcs_enabled:
            from ..spec import lmcs as lmcsmod
            lmcs_cw = lmcsmod.derive_model(padded[0], cfg.bit_depth)
            fwd_lut, inv_lut = lmcsmod.build_luts(lmcs_cw, cfg.bit_depth)
            crs_lut = lmcsmod.build_crs_lut(lmcs_cw, cfg.bit_depth)
            scan_y = fwd_lut[padded[0]]
        hd = jdecide.decide_frame_device(padded[0], qp, cfg.bit_depth,
                                         mip=sps.mip_enabled,
                                         mrl=sps.mrl_enabled,
                                         isp=sps.isp_enabled,
                                         mtt=sps.mtt_enabled,
                                         ibc=sps.ibc_enabled,
                                         tt=sps.tt_enabled,
                                         plt=sps.plt_enabled)
        return (padded, lmcs_cw, fwd_lut, inv_lut, crs_lut, scan_y, hd)

    def finish(p):
        poc, dec, out, chain, lmcs_cw = p
        from ..core import xfer
        fetched = xfer.device_get(list(out[3:]) + list(chain))
        (ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp, sbtp,
         cy, ccb, ccr, sao_t, sao_o, sao_b) = fetched
        levels = [ly, lcb, lcr]
        if sps.mts_enabled or sps.ts_enabled:
            dec.mts8[:] = mtsp.astype(np.uint8)
        if sps.lfnst_enabled:
            dec.lfnst8[:] = lfnstp.astype(np.uint8)
        if sps.cclm_enabled:
            dec.cmode8[:] = cmodep.astype(np.uint8)
        if sps.jccr_enabled:
            dec.jccr8[:] = jccrp.astype(np.uint8)
        if sps.sbt_enabled:
            dec.sbt8[:] = sbtp.astype(np.uint8)
        sh = hls.SliceHeader(poc=poc, slice_type=hls.SLICE_I, qp_delta=0,
                             ref_pocs=(), lmcs_cw=lmcs_cw)
        rec = [cy, ccb, ccr]
        sao_params = None
        if sps.sao_enabled:
            from ..spec.sao import SaoParams
            sao_params = SaoParams(type=sao_t.astype(np.int32),
                                   offsets=sao_o.astype(np.int32),
                                   band_pos=sao_b.astype(np.int32))
        alf_params = None
        if sps.alf_enabled:
            from ..spec import alf as alfmod
            padded = pendmeta[poc]
            alf_params = alfmod.derive_alf_frame(padded, rec, qp,
                                                 cfg.ctu, cfg.bit_depth)
            rec = lfk.apply_alf_frame_j(rec, alf_params, cfg.ctu,
                                        cfg.bit_depth)
        payload = entropy.encode_frame_syntax(sps, pps, sh, dec, levels,
                                              sao_params, alf_params)
        cropped = scodec.crop_planes(rec, sps)
        nals.append(bs.NalUnit(bs.NAL_IDR_N_LP, payload, temporal_id=0))
        nals.append(bs.NalUnit(bs.NAL_SUFFIX_SEI,
                               hls.write_pic_hash_sei(cropped,
                                                      cfg.bit_depth,
                                                      cfg.hash_type),
                               temporal_id=0))
        recons[poc] = cropped
        bits[poc] = 8 * len(payload)

    n = len(frames)
    pre = [None, None]
    pendmeta = {}
    pre[0] = start_decide(0)
    for poc in range(n):
        if poc + 1 < n:            # decide-ahead: next frame's device pass
            pre[(poc + 1) % 2] = start_decide(poc + 1)
        (padded, lmcs_cw, fwd_lut, inv_lut, crs_lut, scan_y,
         hd) = pre[poc % 2]
        dec = jdecide.decide_frame_assemble(hd)
        if decisions_out is not None:
            decisions_out.append(dec)
        pkw = {}
        if sps.plt_enabled:
            from ..spec import palette as pltmod
            pltmod.derive_plt_data(dec, scan_y, padded[1], padded[2],
                                   cfg.bit_depth)
            ppl = pltmod.build_planes(dec.plt_data or {}, sps.height,
                                      sps.width)
            pkw = dict(plt_y=jnp_asarray(ppl[0]),
                       plt_cb=jnp_asarray(ppl[1]),
                       plt_cr=jnp_asarray(ppl[2]))
        slots = recon.make_slots(dec, sps.height, sps.width, 1 << sps.log2_ctu)
        out = _scan_fn()(
            slots, scan_y, padded[1], padded[2], frame_w=sps.width,
            frame_h=sps.height, qp=qp, bd=cfg.bit_depth, encode=True,
            mts=sps.mts_enabled, lfnst=sps.lfnst_enabled,
            cclm=sps.cclm_enabled, rdoq=cfg.rdoq, lmcs=sps.lmcs_enabled,
            mip=sps.mip_enabled, tskip=sps.ts_enabled,
            jccr=sps.jccr_enabled, isp=sps.isp_enabled,
            mtt=sps.mtt_enabled, ibc=sps.ibc_enabled, dq=sps.dq_enabled,
            fwd_lut=None if fwd_lut is None else jnp_asarray(fwd_lut),
            crs_lut=None if crs_lut is None else jnp_asarray(crs_lut),
            lam_rd=lambda_rd_int(qp), **pkw)
        chain = lfk.finish_frame_j(
            [out[0], out[1], out[2]], dec, qp, lam_sao, padded,
            inv_lut=inv_lut, ctu=cfg.ctu, bd=cfg.bit_depth,
            deblock_on=sps.deblock_enabled, sao_on=sps.sao_enabled)
        pendmeta[poc] = padded
        if pending is not None:    # host entropy overlaps device compute
            finish(pending)
            del pendmeta[pending[0]]
            pending = None
        pending = (poc, dec, out, chain, lmcs_cw)
    finish(pending)
    return bs.write_annexb(nals), recons, bits


def encode_sequence(frames, cfg: sseq.EncoderConfig, decisions_fn=None,
                    decisions_out=None):
    if cfg.subpic_cols * cfg.subpic_rows > 1:
        from ..dist.subpic import encode_subpics
        # sequential over subpics: concurrent device encodes would fight
        # for the one chip (GOP-DP uses threads; the SP axis maps to one
        # chip per subpic on a pod slice)
        return encode_subpics(frames, cfg,
                              lambda fr, c: encode_sequence(fr, c),
                              threads=False)
    h, w = frames[0][0].shape
    sps = cfg.make_sps(w, h)
    from ..kernels.intra_pred import set_log2_ctu
    set_log2_ctu(sps.log2_ctu)
    pps = hls.PPS(init_qp=cfg.qp, entropy_sync=cfg.wpp,
                  num_tile_cols=cfg.tile_cols, num_tile_rows=cfg.tile_rows)
    nals = [bs.NalUnit(bs.NAL_SPS, sps.write()),
            bs.NalUnit(bs.NAL_PPS, pps.write())]
    recons = [None] * len(frames)
    bits = [None] * len(frames)
    dpb = {}   # poc -> filtered recon (padded planes, numpy)
    mot = {}   # poc -> motion_record (TMVP side table)
    if cfg.mctf:
        from ..spec import mctf as mctfmod
        frames = mctfmod.temporal_filter(frames, cfg.gop)
    if (cfg.intra_period == 1 and cfg.rc_bits_per_frame == 0
            and cfg.tile_cols * cfg.tile_rows == 1
            and decisions_fn is None):
        import os
        if (len(frames) > 1 and not sps.lmcs_enabled
                and sps.width * sps.height >= (1 << 20)
                and not os.environ.get("VVCTPU_NO_FRAME_BATCH")):
            # frame-batched wavefront (merged multi-frame wave schedule);
            # pays off at HD+ sizes where per-frame wave anti-chains are
            # the bottleneck — at CIF the decide-ahead pipeline below is
            # faster.  LMCS needs per-frame luts -> per-frame path too.
            return _encode_ai_batched(frames, cfg, sps, pps, nals, recons,
                                      bits, decisions_out=decisions_out)
        return _encode_ai_pipelined(frames, cfg, sps, pps, nals, recons,
                                    bits, decisions_out=decisions_out)
    rc = sseq.RateControl(cfg.rc_bits_per_frame) \
        if cfg.rc_bits_per_frame > 0 else None
    plan = list(sseq.gop_plan(len(frames), cfg.intra_period, cfg.gop))
    import os
    can_batch = (rc is None and cfg.tile_cols * cfg.tile_rows == 1
                 and decisions_fn is None and not sps.lmcs_enabled
                 and not os.environ.get("VVCTPU_NO_FRAME_BATCH"))
    pool = None
    from ..core import trace as _trace
    if can_batch and not _trace.enabled \
            and not os.environ.get("VVCTPU_NO_ENTROPY_OVERLAP"):
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
    pi = 0
    while pi < len(plan):
        if can_batch:
            grp = _b_group(plan, pi)
            if len(grp) > 1:
                _encode_b_group(frames, cfg, sps, pps, grp, dpb, mot,
                                nals, recons, bits,
                                decisions_out=decisions_out, pool=pool)
                pi += len(grp)
                continue
        poc, stype, ref_pocs, qpd = plan[pi]
        pi += 1
        planes = frames[poc]
        padded = scodec.pad_planes(planes, sps)
        # temporal sublayer id from the GOP plan layer (twin of
        # spec/sequence.py; enables sublayer extraction)
        tid = 0 if stype != hls.SLICE_B else max(qpd - 1, 1)
        if rc is not None:
            qpd = max(0, min(63 - cfg.qp, qpd + rc.qp_offset()))
        qp = cfg.qp + qpd
        is_intra = stype == hls.SLICE_I
        if decisions_fn is not None:
            dec = decisions_fn(poc, planes, sps, cfg)
        elif is_intra:
            # device-batched decision pass (bit-identical to spec decide)
            dec = jdecide.decide_frame(padded[0], qp, cfg.bit_depth,
                                       mip=sps.mip_enabled,
                                       mrl=sps.mrl_enabled,
                                       isp=sps.isp_enabled,
                                       mtt=sps.mtt_enabled,
                                       ibc=sps.ibc_enabled,
                                       tt=sps.tt_enabled,
                                       plt=sps.plt_enabled)
        elif stype == hls.SLICE_P:
            dec = jdecide.decide_frame_p(padded[0], dpb[ref_pocs[0]][0], qp,
                                         cfg.bit_depth, mip=sps.mip_enabled,
                                         mrl=sps.mrl_enabled,
                                         ciip=sps.ciip_enabled,
                                         isp=sps.isp_enabled,
                                         affine=sps.affine_enabled,
                                         mtt=sps.mtt_enabled,
                                         tt=sps.tt_enabled, prepadded=True,
                                         me_ext=abs(poc - ref_pocs[0]) > 1)
        else:
            dec = jdecide.decide_frame_b(padded[0], dpb[ref_pocs[0]][0],
                                         dpb[ref_pocs[1]][0], qp,
                                         cfg.bit_depth, mip=sps.mip_enabled,
                                         mrl=sps.mrl_enabled,
                                         bcw=sps.bcw_enabled,
                                         ciip=sps.ciip_enabled,
                                         isp=sps.isp_enabled,
                                         gpm=sps.gpm_enabled,
                                         affine=sps.affine_enabled,
                                         mtt=sps.mtt_enabled,
                                         tt=sps.tt_enabled, prepadded=True,
                                         me_ext=max(abs(poc - r)
                                                    for r in ref_pocs) > 1)
        if decisions_out is not None:
            decisions_out.append(dec)
        lmcs_cw = ()
        fwd_lut = inv_lut = crs_lut = None
        scan_y = padded[0]
        if sps.lmcs_enabled:
            from ..spec import lmcs as lmcsmod
            lmcs_cw = lmcsmod.derive_model(padded[0], cfg.bit_depth)
            fwd_lut, inv_lut = lmcsmod.build_luts(lmcs_cw, cfg.bit_depth)
            crs_lut = lmcsmod.build_crs_lut(lmcs_cw, cfg.bit_depth)
            scan_y = fwd_lut[padded[0]]
        from ..spec.transform import lambda_rd_int
        sym = (len(ref_pocs) == 2 and ref_pocs[0] < poc < ref_pocs[1]
               and poc - ref_pocs[0] == ref_pocs[1] - poc)
        scan_kw = dict(
            qp=qp, bd=cfg.bit_depth, encode=True, mts=sps.mts_enabled,
            lfnst=sps.lfnst_enabled, cclm=sps.cclm_enabled, rdoq=cfg.rdoq,
            lmcs=sps.lmcs_enabled, mip=sps.mip_enabled,
            tskip=sps.ts_enabled, jccr=sps.jccr_enabled,
            dmvr=sps.dmvr_enabled and sym, bdof=sps.bdof_enabled and sym,
            ciip=sps.ciip_enabled, sbt=sps.sbt_enabled,
            isp=sps.isp_enabled, gpm=sps.gpm_enabled,
            affine=sps.affine_enabled, dq=sps.dq_enabled,
            mtt=sps.mtt_enabled, ibc=sps.ibc_enabled,
            fwd_lut=None if fwd_lut is None else jnp_asarray(fwd_lut),
            crs_lut=None if crs_lut is None else jnp_asarray(crs_lut),
            lam_rd=lambda_rd_int(qp))
        if sps.plt_enabled and is_intra:
            from ..spec import palette as pltmod
            pltmod.derive_plt_data(dec, scan_y, padded[1], padded[2],
                                   cfg.bit_depth)
            ppl = pltmod.build_planes(dec.plt_data or {}, sps.height,
                                      sps.width)
            scan_kw.update(plt_y=ppl[0], plt_cb=ppl[1], plt_cr=ppl[2])
        n_tiles1 = pps.num_tile_cols * pps.num_tile_rows == 1
        (ry, rcb, rcr, ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp,
         sbtp) = _run_scan(sps, pps, dec, scan_y, padded[1], padded[2],
                           dpb, ref_pocs, scan_kw, fetch=not n_tiles1)
        _finish_frame(
            cfg, sps, pps, dec, padded, poc, stype, ref_pocs, qpd, qp,
            tid, lmcs_cw, inv_lut,
            (ry, rcb, rcr, ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp,
             sbtp), dpb, mot, nals, recons, bits,
            pool=pool if rc is None else None)
        if rc is not None:
            rc.update(bits[poc])
    if pool is not None:
        flat = []
        for n in nals:
            if hasattr(n, "result"):
                flat.extend(n.result())
            else:
                flat.append(n)
        pool.shutdown()
        nals = flat
    return bs.write_annexb(nals), recons, bits


def _finish_frame(cfg, sps, pps, dec, padded, poc, stype, ref_pocs, qpd,
                  qp, tid, lmcs_cw, inv_lut, scan_out, dpb, mot, nals,
                  recons, bits, pool=None):
    """Post-scan tail of one inter/main-loop frame: loop-filter chain ON
    DEVICE (deblock + SAO decide/apply, kernels/loopfilter.finish_frame_j
    — bit-exact twin of the spec chain), ONE fetch of everything, then
    host entropy/NAL; the padded reference planes for future frames stay
    device-resident (recon.pad_refs_dev).  Shared by the sequential path
    and the B-layer batched path (byte-identical)."""
    from ..core import xfer
    from ..kernels import loopfilter as lfk
    is_intra = stype == hls.SLICE_I
    (ry, rcb, rcr, ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp,
     sbtp) = scan_out
    lam_sao = int(round(0.57 * (2.0 ** ((qp - 12) / 3.0)) * 256.0))
    chain = lfk.finish_frame_j(
        [ry, rcb, rcr], dec, qp, lam_sao, padded, inv_lut=inv_lut,
        ctu=cfg.ctu, bd=cfg.bit_depth, deblock_on=sps.deblock_enabled,
        sao_on=sps.sao_enabled)
    refs_dev = None
    if not sps.alf_enabled:
        refs_dev = recon.pad_refs_dev(chain[:3])
    fetched = xfer.device_get(
        [ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp, sbtp] + list(chain))
    (ly, lcb, lcr, mtsp, lfnstp, cmodep, jccrp, sbtp, cy, ccb, ccr,
     sao_t, sao_o, sao_b) = fetched
    levels = [ly, lcb, lcr]
    if sps.mts_enabled or sps.ts_enabled:
        dec.mts8[:] = mtsp.astype(np.uint8)
    if sps.lfnst_enabled:
        dec.lfnst8[:] = lfnstp.astype(np.uint8)
    if sps.cclm_enabled:
        dec.cmode8[:] = cmodep.astype(np.uint8)
    if sps.jccr_enabled:
        dec.jccr8[:] = jccrp.astype(np.uint8)
    if sps.sbt_enabled:
        dec.sbt8[:] = sbtp.astype(np.uint8)
    sh = hls.SliceHeader(poc=poc, slice_type=stype, qp_delta=qpd,
                         ref_pocs=ref_pocs, lmcs_cw=lmcs_cw)
    rec = [cy, ccb, ccr]
    sao_params = None
    if sps.sao_enabled:
        from ..spec.sao import SaoParams
        sao_params = SaoParams(type=sao_t.astype(np.int32),
                               offsets=sao_o.astype(np.int32),
                               band_pos=sao_b.astype(np.int32))
    alf_params = None
    if sps.alf_enabled:
        from ..spec import alf as alfmod
        alf_params = alfmod.derive_alf_frame(padded, rec, qp, cfg.ctu,
                                             cfg.bit_depth)
        rec = lfk.apply_alf_frame_j(rec, alf_params, cfg.ctu,
                                    cfg.bit_depth)
        refs_dev = recon.pad_refs_dev(rec)
    col = scodec.col_motion(mot, poc, ref_pocs)
    dpb[poc] = refs_dev
    mot[poc] = scodec.motion_record(dec, ref_pocs)

    def tail():
        payload = entropy.encode_frame_syntax(
            sps, pps, sh, dec, levels, sao_params, alf_params, col=col)
        cropped = scodec.crop_planes(rec, sps)
        recons[poc] = cropped
        bits[poc] = 8 * len(payload)
        return [bs.NalUnit(
            bs.NAL_IDR_N_LP if is_intra else bs.NAL_TRAIL, payload,
            temporal_id=tid),
            bs.NalUnit(bs.NAL_SUFFIX_SEI,
                       hls.write_pic_hash_sei(cropped, cfg.bit_depth,
                                              cfg.hash_type),
                       temporal_id=tid)]

    if pool is not None:
        # host entropy runs on the worker while the main thread dispatches
        # the next group's device passes (single worker = coding order;
        # the future is resolved into NAL order at stream assembly)
        nals.append(pool.submit(tail))
    else:
        nals.extend(tail())


def _b_group(plan, i, cap: int = 8):
    """Maximal run plan[i:j] of mutually-independent B entries with equal
    qp_delta and equal BI symmetry (shared scan statics) — the frames of
    one temporal layer under the BFS GOP plan."""
    p0, s0, r0, q0 = plan[i]
    if s0 != hls.SLICE_B or len(r0) != 2:
        return plan[i:i + 1]

    def sym(e):
        poc, _, refs, _ = e
        return (refs[0] < poc < refs[1]
                and poc - refs[0] == refs[1] - poc)

    grp = [plan[i]]
    pocs = {p0}
    for j in range(i + 1, min(len(plan), i + cap)):
        poc, stype, refs, qpd = plan[j]
        if (stype != hls.SLICE_B or len(refs) != 2 or qpd != q0
                or sym(plan[j]) != sym(plan[i])
                or any(r in pocs for r in refs)):
            break
        grp.append(plan[j])
        pocs.add(poc)
    return grp


def _encode_b_group(frames, cfg, sps, pps, grp, dpb, mot, nals, recons,
                    bits, decisions_out=None, pool=None):
    """Encode one temporal layer's B frames as a single frame-batched
    wavefront execution (pipeline/wave.frame_wave_batch): per-frame
    decisions + phase-A inter batches + merged phase-B wave scan, then the
    shared per-frame finish.  Byte-identical to the sequential path."""
    from ..core import xfer
    from ..spec.transform import lambda_rd_int
    from . import wave
    qp = cfg.qp + grp[0][3]
    qpd = grp[0][3]
    sym = (grp[0][2][0] < grp[0][0] < grp[0][2][1]
           and grp[0][0] - grp[0][2][0] == grp[0][2][1] - grp[0][0])
    scan_kw = dict(
        qp=qp, bd=cfg.bit_depth, encode=True, mts=sps.mts_enabled,
        lfnst=sps.lfnst_enabled, cclm=sps.cclm_enabled, rdoq=cfg.rdoq,
        lmcs=False, mip=sps.mip_enabled, tskip=sps.ts_enabled,
        jccr=sps.jccr_enabled, dmvr=sps.dmvr_enabled and sym,
        bdof=sps.bdof_enabled and sym, ciip=sps.ciip_enabled,
        sbt=sps.sbt_enabled, isp=sps.isp_enabled, gpm=sps.gpm_enabled,
        affine=sps.affine_enabled, dq=sps.dq_enabled,
        mtt=sps.mtt_enabled, ibc=sps.ibc_enabled,
        lam_rd=lambda_rd_int(qp))
    fins, decs, padded_l = [], [], []
    for (poc, stype, ref_pocs, _q) in grp:
        padded = scodec.pad_planes(frames[poc], sps)
        padded_l.append(padded)
        dec = jdecide.decide_frame_b(
            padded[0], dpb[ref_pocs[0]][0], dpb[ref_pocs[1]][0], qp,
            cfg.bit_depth, mip=sps.mip_enabled, mrl=sps.mrl_enabled,
            bcw=sps.bcw_enabled, ciip=sps.ciip_enabled,
            isp=sps.isp_enabled, gpm=sps.gpm_enabled,
            affine=sps.affine_enabled, mtt=sps.mtt_enabled,
            tt=sps.tt_enabled, prepadded=True,
            me_ext=max(abs(poc - r) for r in ref_pocs) > 1)
        decs.append(dec)
        if decisions_out is not None:
            decisions_out.append(dec)
        slots, isl = recon.make_slots_split(dec, sps.height, sps.width, 1 << sps.log2_ctu)
        r0 = dpb[ref_pocs[0]]
        r1 = dpb[ref_pocs[1]]
        from . import plan as planmod
        fins.append(dict(
            slots=slots, py=padded[0], pcb=padded[1], pcr=padded[2],
            inter={s: isl[s] for s in (8, 16, 32)},
            rect=({sh: isl[sh] for sh in planmod.RECT_SHAPES}
                  if sps.mtt_enabled else None),
            refs=(r0[0], r0[1], r0[2], r1[0], r1[1], r1[2])))
    outs = wave.frame_wave_batch(fins, frame_w=sps.width,
                                 frame_h=sps.height, **scan_kw)
    for i, (poc, stype, ref_pocs, _q) in enumerate(grp):
        tid = max(qpd - 1, 1)
        _finish_frame(cfg, sps, pps, decs[i], padded_l[i], poc, stype,
                      ref_pocs, qpd, qp, tid, (), None, outs[i], dpb,
                      mot, nals, recons, bits, pool=pool)


def decode_sequence(data: bytes, check_hash: bool = True):
    """Two-pass decoder: host CABAC parse of every slice first (the TMVP
    side-table updates at parse time, so parsing runs ahead of pixel
    reconstruction), then frame-batched wavefront reconstruction — groups
    of mutually-independent frames (all-intra, or one temporal layer's B
    pictures) run as ONE merged scan (pipeline/wave.frame_wave_batch)."""
    from ..io import streamtools
    layout = streamtools.subpic_layout(data)
    if layout is not None:
        from ..dist.subpic import decode_subpics
        return decode_subpics(
            data, layout,
            lambda d, ch: decode_sequence(d, check_hash=ch), check_hash)
    sps = None
    pps_map: dict[int, hls.PPS] = {}
    frames = {}
    dpb = {}
    mot = {}
    entries = []
    for nal in bs.read_annexb(data):
        if nal.nal_type == bs.NAL_SPS:
            sps = hls.SPS.read(nal.payload)
            from ..kernels.intra_pred import set_log2_ctu
            set_log2_ctu(sps.log2_ctu)
        elif nal.nal_type == bs.NAL_PPS:
            p = hls.PPS.read(nal.payload)
            pps_map[p.pps_id] = p
        elif nal.nal_type in (bs.NAL_IDR_N_LP, bs.NAL_IDR_W_RADL,
                              bs.NAL_TRAIL, bs.NAL_CRA):
            sh, dec, levels, sao_params, alf_params = \
                entropy.parse_frame_syntax(nal.payload, sps, pps_map,
                                           motion=mot)
            mot[sh.poc] = scodec.motion_record(dec, sh.ref_pocs)
            entries.append(dict(sh=sh, dec=dec, levels=levels,
                                sao=sao_params, alf=alf_params,
                                digest=None))
        elif nal.nal_type == bs.NAL_SUFFIX_SEI and check_hash and entries:
            parsed = hls.read_pic_hash_sei(nal.payload)
            if parsed is not None:
                entries[-1]["digest"] = parsed

    from ..spec.codec import bi_sym
    import os

    def gkey(e):
        sh = e["sh"]
        pps_d = pps_map[sh.pps_id]
        return (sh.slice_type != hls.SLICE_I, bi_sym(sh), sh.qp_delta,
                len(sh.ref_pocs), bool(sh.lmcs_cw),
                pps_d.num_tile_cols * pps_d.num_tile_rows)

    can_batch = not os.environ.get("VVCTPU_NO_FRAME_BATCH")
    i = 0
    pending = []       # (entry, device recon) fetched AFTER the next
    # group's device work is dispatched — overlaps the slow D2H tunnel
    # fetch (~0.3 s/frame at 1080p) with device compute
    while i < len(entries):
        grp = [entries[i]]
        if can_batch:
            k0 = gkey(entries[i])
            if not k0[4] and k0[5] == 1:
                pocs = {entries[i]["sh"].poc}
                j = i + 1
                while (j < len(entries) and len(grp) < 8
                       and gkey(entries[j]) == k0
                       and not any(r in pocs
                                   for r in entries[j]["sh"].ref_pocs)):
                    grp.append(entries[j])
                    pocs.add(entries[j]["sh"].poc)
                    j += 1
        if len(grp) > 1:
            done = _decode_group(grp, sps, pps_map, dpb)
        else:
            done = _decode_one(entries[i], sps, pps_map, dpb)
        for pe, pr in pending:
            _dec_fetch(pe, sps, pr, frames, check_hash)
        pending = done
        i += len(grp)
    for pe, pr in pending:
        _dec_fetch(pe, sps, pr, frames, check_hash)
    return [frames[p] for p in sorted(frames)], sps


def _dec_scan_kw(sh, sps, pps_map, fwd_lut, crs_lut):
    from ..spec.codec import bi_sym
    qp = pps_map[sh.pps_id].init_qp + sh.qp_delta
    return dict(
        qp=qp, bd=sps.bit_depth, encode=False,
        mts=sps.mts_enabled, lfnst=sps.lfnst_enabled,
        cclm=sps.cclm_enabled, lmcs=fwd_lut is not None,
        mip=sps.mip_enabled, tskip=sps.ts_enabled,
        jccr=sps.jccr_enabled,
        dmvr=sps.dmvr_enabled and bi_sym(sh),
        bdof=sps.bdof_enabled and bi_sym(sh),
        ciip=sps.ciip_enabled, sbt=sps.sbt_enabled,
        isp=sps.isp_enabled, gpm=sps.gpm_enabled,
        affine=sps.affine_enabled, dq=sps.dq_enabled,
        mtt=sps.mtt_enabled, ibc=sps.ibc_enabled,
        fwd_lut=None if fwd_lut is None else jnp_asarray(fwd_lut),
        crs_lut=None if crs_lut is None else jnp_asarray(crs_lut))


def _dec_filters(e, sps, rec, inv_lut, qp, dpb):
    """Dispatch the loop-filter chain on DEVICE and refresh the
    device-resident DPB; returns the (device) filtered planes WITHOUT
    fetching — the caller overlaps the fetch with the next group's
    device work (_dec_fetch)."""
    from ..core import xfer
    from ..kernels import loopfilter as lfk
    if inv_lut is not None:
        # LMCS path keeps host arithmetic (per-frame luts, rare)
        rec = [np.asarray(r) for r in xfer.device_get(list(rec))] \
            if not isinstance(rec[0], np.ndarray) else rec
        rec[0] = inv_lut[rec[0]]
    if sps.deblock_enabled:
        rec = lfk.deblock_frame_j(rec, e["dec"], qp, sps.bit_depth,
                                  fetch=False)
    if e["sao"] is not None:
        rec = lfk.apply_sao_j(rec, e["sao"], 1 << sps.log2_ctu,
                              sps.bit_depth, fetch=False)
    if e["alf"] is not None:
        rec = lfk.apply_alf_frame_j(rec, e["alf"], 1 << sps.log2_ctu,
                                    sps.bit_depth)
    dpb[e["sh"].poc] = recon.pad_refs_dev(rec)
    return rec


def _dec_fetch(e, sps, rec, frames, check_hash):
    """Blocking tail of a decoded frame: one fetch, crop, hash verify."""
    from ..core import xfer
    sh = e["sh"]
    if not isinstance(rec[0], np.ndarray):
        rec = [np.asarray(r) for r in xfer.device_get(list(rec))]
    out = scodec.crop_planes(rec, sps)
    frames[sh.poc] = out
    if check_hash and e["digest"] is not None:
        htype, digest = e["digest"]
        got = hls.plane_hash(out, sps.bit_depth, htype)
        if got != digest:
            raise ValueError(
                f"decoded-picture hash mismatch at poc {sh.poc}")


def _dec_finish(e, sps, rec, inv_lut, qp, dpb, frames, check_hash):
    rec = _dec_filters(e, sps, rec, inv_lut, qp, dpb)
    _dec_fetch(e, sps, rec, frames, check_hash)


def _decode_one(e, sps, pps_map, dpb):
    sh, dec, levels = e["sh"], e["dec"], e["levels"]
    qp = pps_map[sh.pps_id].init_qp + sh.qp_delta
    fwd_lut = inv_lut = crs_lut = None
    if sh.lmcs_cw:
        from ..spec import lmcs as lmcsmod
        fwd_lut, inv_lut = lmcsmod.build_luts(sh.lmcs_cw, sps.bit_depth)
        crs_lut = lmcsmod.build_crs_lut(sh.lmcs_cw, sps.bit_depth)
    is_p = sh.slice_type != hls.SLICE_I
    scan_kw = _dec_scan_kw(sh, sps, pps_map, fwd_lut, crs_lut)
    if sps.plt_enabled and dec.plt_data:
        from ..spec import palette as pltmod
        ppl = pltmod.build_planes(dec.plt_data, sps.height, sps.width)
        scan_kw.update(plt_y=ppl[0], plt_cb=ppl[1], plt_cr=ppl[2])
    n_tiles1 = (pps_map[sh.pps_id].num_tile_cols
                * pps_map[sh.pps_id].num_tile_rows == 1)
    ry, rcb, rcr, *_ = _run_scan(
        sps, pps_map[sh.pps_id], dec, levels[0], levels[1], levels[2],
        dpb, sh.ref_pocs if is_p else (), scan_kw, fetch=not n_tiles1)
    rec = _dec_filters(e, sps, [ry, rcb, rcr], inv_lut, qp, dpb)
    return [(e, rec)]


def _decode_group(grp, sps, pps_map, dpb):
    """Reconstruct a batch of mutually-independent parsed frames as one
    merged wave scan (+ one batched phase-A inter pass)."""
    from ..core import xfer
    from . import plan as planmod
    from . import wave
    sh0 = grp[0]["sh"]
    qp = pps_map[sh0.pps_id].init_qp + sh0.qp_delta
    is_p = sh0.slice_type != hls.SLICE_I
    scan_kw = _dec_scan_kw(sh0, sps, pps_map, None, None)
    scan_kw.pop("fwd_lut")
    scan_kw.pop("crs_lut")
    mtt = scan_kw["mtt"]
    fins = []
    for e in grp:
        dec, levels = e["dec"], e["levels"]
        fr = dict(py=levels[0], pcb=levels[1], pcr=levels[2])
        if is_p:
            slots, isl = recon.make_slots_split(dec, sps.height, sps.width, 1 << sps.log2_ctu)
            fr["inter"] = {s: isl[s] for s in (8, 16, 32)}
            if mtt:
                fr["rect"] = {sh: isl[sh] for sh in planmod.RECT_SHAPES}
            refs = e["sh"].ref_pocs
            r0 = dpb[refs[0]]
            r1 = dpb[refs[1]] if len(refs) == 2 else r0
            fr["refs"] = (r0[0], r0[1], r0[2], r1[0], r1[1], r1[2])
        else:
            slots = recon.make_slots(dec, sps.height, sps.width, 1 << sps.log2_ctu)
            if sps.plt_enabled and dec.plt_data:
                from ..spec import palette as pltmod
                fr["plt"] = pltmod.build_planes(dec.plt_data, sps.height,
                                                sps.width)
        fr["slots"] = slots
        fins.append(fr)
    outs = wave.frame_wave_batch(fins, frame_w=sps.width,
                                 frame_h=sps.height, **scan_kw)
    return [(e, _dec_filters(e, sps, list(outs[gi][:3]), None, qp, dpb))
            for gi, e in enumerate(grp)]
