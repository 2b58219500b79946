"""Sequence-level spec codec: Annex-B assembly, hash SEI, decode verification.

Role of VTM:App/EncoderApp (EncApp::encode loop + NAL emission) and
VTM:App/DecoderApp (DecApp::decode, MD5 verify) for the spec model.  The JAX
pipeline (vvctpu/pipeline/) produces byte-identical streams via the same HLS
writers; only the frame engine differs.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import bitstream as bs
from ..core import rom
from . import codec, decide, hls


@dataclass
class EncoderConfig:
    qp: int = 32
    bit_depth: int = 8
    ctu: int = 64
    deblock: bool = True
    sao: bool = True
    intra_period: int = 1   # 1 = all-intra; 0 = first frame only; N = every N
    wpp: bool = False       # wavefront entropy lanes (one per CTU row)

    def make_sps(self, width: int, height: int) -> hls.SPS:
        pw = -(-width // self.ctu) * self.ctu
        ph = -(-height // self.ctu) * self.ctu
        return hls.SPS(width=pw, height=ph,
                       conf_win=(0, pw - width, 0, ph - height),
                       bit_depth=self.bit_depth,
                       log2_ctu=int(self.ctu).bit_length() - 1,
                       deblock_enabled=self.deblock,
                       sao_enabled=self.sao)


def encode_sequence(frames: list[list[np.ndarray]], cfg: EncoderConfig,
                    decisions_fn=None, decisions_out: list | None = None):
    """frames: list of [Y, Cb, Cr] planes (output size).  Returns
    (annexb_bytes, recon_frames[cropped], per_frame_bits)."""
    h, w = frames[0][0].shape
    sps = cfg.make_sps(w, h)
    pps = hls.PPS(init_qp=cfg.qp, entropy_sync=cfg.wpp)
    nals = [bs.NalUnit(bs.NAL_SPS, sps.write()),
            bs.NalUnit(bs.NAL_PPS, pps.write())]
    recons = []
    bits = []
    dpb = None   # previous filtered recon (padded planes)
    for poc, planes in enumerate(frames):
        ip = cfg.intra_period
        is_intra = poc == 0 or (ip == 1) or (ip > 1 and poc % ip == 0)
        if decisions_fn is not None:
            dec = decisions_fn(poc, planes, sps, cfg)
        elif is_intra:
            padded_y = codec.pad_planes(planes, sps)[0]
            dec = decide.decide_frame(padded_y, cfg.qp, cfg.bit_depth)
        else:
            padded_y = codec.pad_planes(planes, sps)[0]
            dec = decide.decide_frame_p(padded_y, dpb[0], cfg.qp,
                                        cfg.bit_depth)
        if decisions_out is not None:
            decisions_out.append(dec)
        sh = hls.SliceHeader(
            poc=poc,
            slice_type=hls.SLICE_I if is_intra else hls.SLICE_P)
        payload, recon = codec.encode_frame(
            planes, sps, pps, sh, dec, refs=None if is_intra else dpb)
        dpb = recon
        cropped = codec.crop_planes(recon, sps)
        nals.append(bs.NalUnit(
            bs.NAL_IDR_N_LP if is_intra else bs.NAL_TRAIL, payload))
        nals.append(bs.NalUnit(
            bs.NAL_SUFFIX_SEI,
            hls.write_pic_hash_sei(cropped, cfg.bit_depth)))
        recons.append(cropped)
        bits.append(8 * len(payload))
    return bs.write_annexb(nals), recons, bits


def decode_sequence(data: bytes, check_hash: bool = True):
    """Returns (frames [cropped planes], sps).  Raises on hash mismatch."""
    sps = None
    pps_map: dict[int, hls.PPS] = {}
    frames = []
    pending = None  # last decoded (cropped) frame awaiting its hash SEI
    dpb = None
    for nal in bs.read_annexb(data):
        if nal.nal_type == bs.NAL_SPS:
            sps = hls.SPS.read(nal.payload)
        elif nal.nal_type == bs.NAL_PPS:
            p = hls.PPS.read(nal.payload)
            pps_map[p.pps_id] = p
        elif nal.nal_type in (bs.NAL_IDR_N_LP, bs.NAL_IDR_W_RADL,
                              bs.NAL_TRAIL, bs.NAL_CRA):
            recon, sh, _ = codec.decode_frame(nal.payload, sps, pps_map,
                                              refs=dpb)
            dpb = recon
            pending = codec.crop_planes(recon, sps)
            frames.append(pending)
        elif nal.nal_type == bs.NAL_SUFFIX_SEI and check_hash:
            digest = hls.read_pic_hash_sei(nal.payload)
            if digest is not None and pending is not None:
                got = hls.plane_md5(pending, sps.bit_depth)
                if got != digest:
                    raise ValueError(
                        f"decoded-picture hash mismatch at frame "
                        f"{len(frames) - 1}")
    return frames, sps


def psnr(ref: np.ndarray, rec: np.ndarray, bit_depth: int = 8) -> float:
    mse = float(np.mean((ref.astype(np.float64) - rec.astype(np.float64)) ** 2))
    if mse == 0:
        return 99.0
    peak = (1 << bit_depth) - 1
    return 10.0 * np.log10(peak * peak / mse)
