"""CLI apps: encode / decode raw YUV <-> Annex-B VVC-style bitstreams.

Role of VTM:App/EncoderApp (EncApp) and VTM:App/DecoderApp (DecApp), with
VTM-flavoured option names (-i/-b/-o/-q/--wdt/--hgt/--frames) so CTC-style
invocations carry over (SURVEY.md §2.8).

    python -m vvctpu encode -i in.yuv --wdt 416 --hgt 240 -q 32 -b out.bin
    python -m vvctpu decode -b out.bin -o rec.yuv

The default engine is the specification model; ``--engine jax`` selects the
TPU engine (vvctpu/pipeline/) once per-frame parity allows.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _enc(args) -> int:
    from .io import yuv
    from .spec import sequence as seq
    if args.cfg:
        from .io.cfg import load_layered
        fc = load_layered(args.cfg)
        args.input = args.input or fc.input_file
        args.bitstream = args.bitstream or fc.bitstream_file
        args.recon = args.recon or (fc.recon_file or None)
        args.wdt = args.wdt or fc.width
        args.hgt = args.hgt or fc.height
        if args.frames is None:
            args.frames = fc.frames
        for a, v in (("qp", fc.qp), ("intra_period", fc.intra_period),
                     ("gop", fc.gop), ("bit_depth", fc.bit_depth),
                     ("wpp", fc.wpp), ("mts", fc.mts), ("lfnst", fc.lfnst),
                     ("cclm", fc.cclm), ("alf", fc.alf), ("mctf", fc.mctf),
                     ("lmcs", fc.lmcs), ("mip", fc.mip),
                     ("mrl", fc.mrl), ("tskip", fc.tskip),
                     ("jccr", fc.jccr), ("mmvd", fc.mmvd),
                     ("dmvr", fc.dmvr), ("bdof", fc.bdof),
                     ("bcw", fc.bcw), ("amvr", fc.amvr),
                     ("smvd", fc.smvd), ("ciip", fc.ciip),
                     ("sbt", fc.sbt), ("isp", fc.isp),
                     ("gpm", fc.gpm), ("affine", fc.affine),
                     ("dq", fc.dq), ("mtt", fc.mtt), ("tt", fc.tt),
                     ("ibc", fc.ibc), ("plt", fc.plt)):
            if ap_defaults.get(a) == getattr(args, a):
                setattr(args, a, v)
        if not fc.rdoq:
            args.no_rdoq = True
    if not (args.input and args.bitstream and args.wdt and args.hgt):
        print("missing input/bitstream/wdt/hgt (flags or cfg)",
              file=sys.stderr)
        return 2
    frames = yuv.read_yuv(args.input, args.wdt, args.hgt, args.frames,
                          args.bit_depth)
    if not frames:
        print("no frames read", file=sys.stderr)
        return 1
    cfg = seq.EncoderConfig(qp=args.qp, bit_depth=args.bit_depth,
                            ctu=args.ctu,
                            intra_period=args.intra_period, wpp=args.wpp,
                            gop=args.gop, mts=args.mts, lfnst=args.lfnst,
                            cclm=args.cclm, alf=args.alf, lmcs=args.lmcs,
                            mip=args.mip, mrl=args.mrl, tskip=args.tskip,
                            jccr=args.jccr, mmvd=args.mmvd,
                            dmvr=args.dmvr, bdof=args.bdof, bcw=args.bcw,
                            amvr=args.amvr, smvd=args.smvd,
                            ciip=args.ciip, sbt=args.sbt, isp=args.isp,
                            gpm=args.gpm, affine=args.affine, dq=args.dq,
                            mtt=args.mtt, tt=args.tt, ibc=args.ibc,
                            plt=args.plt,
                            tile_cols=int(args.tiles.split("x")[0]),
                            tile_rows=int(args.tiles.split("x")[1]),
                            subpic_cols=int(args.subpics.split("x")[0]),
                            subpic_rows=int(args.subpics.split("x")[1]),
                            mctf=args.mctf, rdoq=not args.no_rdoq,
                            rc_bits_per_frame=args.rc_bpf,
                            hash_type={"md5": 0, "crc": 1,
                                       "checksum": 2}[args.hash])
    if args.trace_file:
        from .core import trace
        trace.open_trace(args.trace_file, args.trace_rule)
    t0 = time.time()
    seg_suffix = ""
    if args.distributed:
        # Multi-host GOP/segment parallelism (SURVEY §3.5 Parcat analog):
        # each process encodes its closed-GOP segment; single-process
        # launches are a no-op init and encode the full sequence.
        from .dist.mesh import init_distributed
        from .dist.gop import segment_for_process
        pi = init_distributed(args.coordinator, args.num_processes,
                              args.process_id)
        import jax
        np_ = jax.process_count()
        if np_ > 1:
            s, e = segment_for_process(len(frames), np_, cfg.gop, pi)
            print(f"distributed: process {pi}/{np_} encodes frames "
                  f"[{s}, {e}); concatenate segments with 'vvctpu parcat'")
            frames = frames[s:e]
            seg_suffix = f".seg{pi}"
    if args.gop_parallel > 1:
        from .dist.gop import encode_gop_parallel
        data, recons, bits = encode_gop_parallel(
            frames, cfg, segments=args.gop_parallel, engine=args.engine,
            threads=True)
    elif args.engine == "jax":
        from .pipeline import encoder as jenc
        data, recons, bits = jenc.encode_sequence(frames, cfg)
    else:
        data, recons, bits = seq.encode_sequence(
            frames, cfg, checkpoint_path=args.checkpoint)
    dt = time.time() - t0
    with open(args.bitstream + seg_suffix, "wb") as f:
        f.write(data)
    total_bits = 0
    for poc, planes in enumerate(frames):
        p = [seq.psnr(planes[c], recons[poc][c], args.bit_depth)
             for c in range(3)]
        total_bits += bits[poc]
        from .spec.sequence import gop_plan
        from .spec import hls as _hls
        types = {p[0]: p[1] for p in gop_plan(len(frames),
                                              args.intra_period, args.gop)}
        st = {_hls.SLICE_I: "I", _hls.SLICE_P: "P",
              _hls.SLICE_B: "B"}[types[poc]]
        print(f"POC {poc:4d} {st}  QP {args.qp:2d}  {bits[poc]:8d} bits  "
              f"Y {p[0]:6.3f} dB  U {p[1]:6.3f} dB  V {p[2]:6.3f} dB")
    if args.recon:
        yuv.write_yuv(args.recon, recons, args.bit_depth)
    n = len(frames)
    print(f"SUMMARY: {n} frames, {total_bits} bits, "
          f"{total_bits / max(n, 1):.0f} bits/frame, "
          f"{dt:.2f} s ({n / dt:.3f} fps)")
    return 0


def _parcat(args) -> int:
    from .io.parcat import parcat
    streams = [open(f, "rb").read() for f in args.inputs]
    out = parcat(streams)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"parcat: {len(args.inputs)} segments -> {args.output} "
          f"({len(out)} bytes)")
    return 0


def _sei_remove(args) -> int:
    from .io.streamtools import remove_sei
    with open(args.bitstream, "rb") as f:
        data = f.read()
    out = remove_sei(data, keep_hash=args.keep_hash)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"sei-remove: {len(data)} -> {len(out)} bytes")
    return 0


def _extract(args) -> int:
    from .io.streamtools import extract_layer, extract_sublayer
    with open(args.bitstream, "rb") as f:
        data = f.read()
    if args.layer is not None:
        out = extract_layer(data, args.layer)
    else:
        out = extract_sublayer(data, args.tid)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"extract: {len(data)} -> {len(out)} bytes")
    return 0


def _merge(args) -> int:
    from .io.streamtools import merge_layers
    streams = [open(f, "rb").read() for f in args.inputs]
    out = merge_layers(streams)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"merge: {len(args.inputs)} layers -> {args.output} "
          f"({len(out)} bytes)")
    return 0


def _subpic_extract(args) -> int:
    from .io.streamtools import subpic_extract
    with open(args.bitstream, "rb") as f:
        data = f.read()
    out = subpic_extract(data, args.idx)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"subpic-extract: {len(data)} -> {len(out)} bytes")
    return 0


def _subpic_merge(args) -> int:
    from .io.streamtools import subpic_merge
    cols, rows = (int(v) for v in args.grid.split("x"))
    streams = [open(f, "rb").read() for f in args.inputs]
    out = subpic_merge(streams, cols, rows)
    with open(args.output, "wb") as f:
        f.write(out)
    print(f"subpic-merge: {len(args.inputs)} subpics -> {args.output} "
          f"({len(out)} bytes)")
    return 0


def _filmgrain(args) -> int:
    from .io import filmgrain as fg
    with open(args.bitstream, "rb") as f:
        data = f.read()
    if args.add:
        out = fg.add_fgc(data, args.scale, args.seed, [(0, 255, args.gain)])
        with open(args.output, "wb") as f:
            f.write(out)
        print(f"filmgrain: FGC SEI added -> {args.output}")
        return 0
    params = fg.find_fgc(data)
    if params is None:
        print("no film-grain SEI in stream", file=sys.stderr)
        return 1
    from .io import yuv
    from .spec import sequence as seqmod
    frames, sps = seqmod.decode_sequence(data, check_hash=True)
    grained = fg.synthesize(frames, params, sps.bit_depth)
    yuv.write_yuv(args.output, grained, sps.bit_depth)
    print(f"filmgrain: {len(frames)} frames grained -> {args.output}")
    return 0


def _info(args) -> int:
    from .io.streamtools import stream_info
    with open(args.bitstream, "rb") as f:
        data = f.read()
    rows = stream_info(data)
    for i, r in enumerate(rows):
        print(f"{i:4d}  {r['type']:12s} layer {r['layer']} tid {r['tid']} "
              f"{r['bytes']:8d} bytes")
    print(f"total: {len(rows)} NAL units, {len(data)} bytes")
    return 0


def _dec(args) -> int:
    from .io import yuv
    from .spec import sequence as seq
    if args.trace_file:
        from .core import trace
        trace.open_trace(args.trace_file, args.trace_rule)
    with open(args.bitstream, "rb") as f:
        data = f.read()
    t0 = time.time()
    stats = {} if args.bitstats else None
    frames, sps = seq.decode_sequence(data, check_hash=not args.no_hash,
                                      stats=stats)
    dt = time.time() - t0
    yuv.write_yuv(args.output, frames, sps.bit_depth)
    print(f"decoded {len(frames)} frames "
          f"{frames[0][0].shape[1]}x{frames[0][0].shape[0]} in {dt:.2f} s "
          f"({len(frames) / max(dt, 1e-9):.3f} fps)"
          + ("" if args.no_hash else "; all picture hashes verified"))
    if stats is not None:
        total = sum(stats.values())
        print(f"bin statistics ({total} bins):")
        for name, cnt in sorted(stats.items(), key=lambda kv: -kv[1]):
            print(f"  {name:28s} {cnt:10d}  {100.0 * cnt / total:5.1f}%")
    return 0


ap_defaults = {"qp": 32, "intra_period": 1, "gop": 1, "bit_depth": 8,
               "wpp": False, "mts": False, "lfnst": False, "cclm": False,
               "alf": False, "mctf": False, "lmcs": False, "mip": False,
               "mrl": False, "tskip": False, "jccr": False, "mmvd": False,
               "dmvr": False, "bdof": False, "bcw": False, "amvr": False,
               "smvd": False, "ciip": False, "sbt": False, "isp": False,
               "gpm": False, "affine": False, "dq": False,
               "mtt": False, "tt": False, "ibc": False, "plt": False}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="vvctpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode", help="encode raw YUV to Annex-B bitstream")
    e.add_argument("-c", "--cfg", action="append", default=[],
                   help="VTM-style cfg file (repeatable; later wins)")
    e.add_argument("-i", "--input", help="input .yuv (I420)")
    e.add_argument("-b", "--bitstream", help="output .bin")
    e.add_argument("-o", "--recon", help="optional recon .yuv")
    e.add_argument("--wdt", type=int, help="source width")
    e.add_argument("--hgt", type=int, help="source height")
    e.add_argument("--checkpoint", help="encoder checkpoint .npz path")
    e.add_argument("--hash", default="md5",
                   choices=("md5", "crc", "checksum"),
                   help="decoded-picture-hash SEI type")
    e.add_argument("-q", "--qp", type=int, default=32)
    e.add_argument("-f", "--frames", type=int, default=None)
    e.add_argument("--bit-depth", type=int, default=8, choices=(8, 10))
    e.add_argument("--ctu", type=int, default=64, choices=(64, 128),
                   help="CTU size (128: implicit QT to the 64 quads; "
                        "IBC/palette require 64)")
    e.add_argument("--ip", "--intra-period", dest="intra_period", type=int,
                   default=1, help="1 = all-intra, 0 = first frame only, "
                   "N = IDR every N frames")
    e.add_argument("--gop", type=int, default=1,
                   help="1 = low-delay IPPP; >1 = hierarchical-B GOP size")
    e.add_argument("--rc-bpf", type=int, default=0,
                   help="rate control: target bits per frame (0 = off)")
    e.add_argument("--mctf", action="store_true",
                   help="motion-compensated temporal source prefilter")
    e.add_argument("--alf", action="store_true",
                   help="adaptive loop filter (luma Wiener, CTU flags)")
    e.add_argument("--lfnst", action="store_true",
                   help="LFNST secondary transform for intra luma")
    e.add_argument("--cclm", action="store_true",
                   help="CCLM chroma-from-luma prediction")
    e.add_argument("--no-rdoq", action="store_true",
                   help="disable the RDOQ quantizer")
    e.add_argument("--dq", action="store_true",
                   help="dependent quantization (4-state trellis)")
    e.add_argument("--mtt", action="store_true",
                   help="multi-type tree (binary splits at 16/32)")
    e.add_argument("--tt", action="store_true",
                   help="ternary splits at 32 nodes (requires --mtt)")
    e.add_argument("--ibc", action="store_true",
                   help="intra block copy (I slices, square leaves)")
    e.add_argument("--plt", action="store_true",
                   help="palette mode (I slices, square leaves)")
    e.add_argument("--tiles", default="1x1",
                   help="tile grid CxR (prediction+entropy break per tile)")
    e.add_argument("--subpics", default="1x1",
                   help="subpicture grid CxR (independent decodable rects,"
                   " one layer each; SubpicMerge/extract roles)")
    e.add_argument("--lmcs", action="store_true",
                   help="LMCS luma mapping (reshaper)")
    e.add_argument("--mip", action="store_true",
                   help="matrix intra prediction (generated weights)")
    e.add_argument("--mrl", action="store_true",
                   help="multi-reference-line intra (lines 0/1/2)")
    e.add_argument("--tskip", action="store_true",
                   help="transform skip (unified tx candidate index 5)")
    e.add_argument("--jccr", action="store_true",
                   help="joint Cb-Cr residual coding")
    e.add_argument("--mmvd", action="store_true",
                   help="merge with MVD (8 distances x 4 directions)")
    e.add_argument("--dmvr", action="store_true",
                   help="decoder-side MV refinement (BI merge leaves)")
    e.add_argument("--bdof", action="store_true",
                   help="bi-directional optical flow (BI leaves)")
    e.add_argument("--bcw", action="store_true",
                   help="bi-prediction with CU weights {3,4,5}/8")
    e.add_argument("--isp", action="store_true",
                   help="intra sub-partitions (stripe TBs, implicit DST7)")
    e.add_argument("--gpm", action="store_true",
                   help="geometric partitioning (64 blend masks, B leaves)")
    e.add_argument("--affine", action="store_true",
                   help="4-parameter affine motion + PROF (16/32 leaves)")
    e.add_argument("--amvr", action="store_true",
                   help="adaptive MVD resolution (1/4, 1, 4 pel)")
    e.add_argument("--smvd", action="store_true",
                   help="symmetric MVD for BI leaves (symmetric refs)")
    e.add_argument("--ciip", action="store_true",
                   help="combined inter-intra prediction (planar blend)")
    e.add_argument("--sbt", action="store_true",
                   help="sub-block transform for inter luma residual")
    e.add_argument("--mts", action="store_true",
                   help="explicit MTS (DST7/DCT8) for intra luma")
    e.add_argument("--wpp", action="store_true",
                   help="wavefront entropy lanes (one per CTU row)")
    e.add_argument("--engine", choices=("spec", "jax"), default="spec")
    e.add_argument("--distributed", action="store_true",
                   help="init jax.distributed; each process encodes its "
                        "closed-GOP segment (bitstream gets .segN suffix "
                        "when process_count > 1; parcat to combine)")
    e.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    e.add_argument("--num-processes", type=int, default=None)
    e.add_argument("--process-id", type=int, default=None)
    e.add_argument("--gop-parallel", type=int, default=1, metavar="N",
                   help="encode N closed-GOP segments independently and "
                        "concatenate (Parcat DP axis; one per host on a "
                        "pod slice)")
    e.add_argument("--trace-file", help="syntax trace output (dtrace equiv)")
    e.add_argument("--trace-rule", default="D_SYNTAX,D_MODE,D_RESID:poc>=0")
    e.set_defaults(fn=_enc)

    d = sub.add_parser("decode", help="decode Annex-B bitstream to raw YUV")
    d.add_argument("-b", "--bitstream", required=True)
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--no-hash", action="store_true",
                   help="skip decoded-picture-hash verification")
    d.add_argument("--bitstats", action="store_true",
                   help="print CABAC bin counts per syntax class "
                        "(DecoderAnalyser role)")
    d.add_argument("--trace-file", help="syntax trace output (dtrace equiv)")
    d.add_argument("--trace-rule", default="D_SYNTAX,D_MODE,D_RESID:poc>=0")
    d.set_defaults(fn=_dec)

    pc = sub.add_parser("parcat",
                        help="concatenate segment bitstreams (Parcat)")
    pc.add_argument("inputs", nargs="+")
    pc.add_argument("-o", "--output", required=True)
    pc.set_defaults(fn=_parcat)

    sr = sub.add_parser("sei-remove",
                        help="strip SEI NAL units (SEIRemovalApp)")
    sr.add_argument("-b", "--bitstream", required=True)
    sr.add_argument("-o", "--output", required=True)
    sr.add_argument("--keep-hash", action="store_true",
                    help="keep decoded-picture-hash suffix SEIs")
    sr.set_defaults(fn=_sei_remove)

    ex = sub.add_parser("extract",
                        help="extract temporal sublayer or layer "
                             "(BitstreamExtractorApp)")
    ex.add_argument("-b", "--bitstream", required=True)
    ex.add_argument("-o", "--output", required=True)
    ex.add_argument("--tid", type=int, default=0,
                    help="max temporal_id to keep (default 0 = anchors)")
    ex.add_argument("--layer", type=int, default=None,
                    help="extract this nuh_layer_id from a merged stream")
    ex.set_defaults(fn=_extract)

    mg = sub.add_parser("merge",
                        help="merge streams into layers (StreamMergeApp)")
    mg.add_argument("inputs", nargs="+")
    mg.add_argument("-o", "--output", required=True)
    mg.set_defaults(fn=_merge)

    se = sub.add_parser("subpic-extract",
                        help="extract one subpicture as a standalone "
                        "stream (BitstreamExtractorApp subpic role)")
    se.add_argument("-b", "--bitstream", required=True)
    se.add_argument("-o", "--output", required=True)
    se.add_argument("--idx", type=int, required=True,
                    help="subpicture index (raster order)")
    se.set_defaults(fn=_subpic_extract)

    sm = sub.add_parser("subpic-merge",
                        help="merge per-subpicture streams into one "
                        "(SubpicMergeApp role)")
    sm.add_argument("inputs", nargs="+")
    sm.add_argument("-o", "--output", required=True)
    sm.add_argument("--grid", required=True, help="CxR grid")
    sm.set_defaults(fn=_subpic_merge)

    fg = sub.add_parser("filmgrain",
                        help="film-grain SEI tool (SEIFilmGrainApp role): "
                        "--add inserts an FGC SEI; default decodes and "
                        "synthesizes grain to YUV")
    fg.add_argument("-b", "--bitstream", required=True)
    fg.add_argument("-o", "--output", required=True)
    fg.add_argument("--add", action="store_true",
                    help="insert FGC SEI instead of synthesizing")
    fg.add_argument("--scale", type=int, default=6,
                    help="log2 grain scale divisor")
    fg.add_argument("--seed", type=int, default=1)
    fg.add_argument("--gain", type=int, default=16)
    fg.set_defaults(fn=_filmgrain)

    nf = sub.add_parser("info", help="list NAL units in a stream")
    nf.add_argument("-b", "--bitstream", required=True)
    nf.set_defaults(fn=_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
