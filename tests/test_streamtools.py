"""Stream tools: SEI removal, sublayer extraction, layer merge (SURVEY §2.8:
SEIRemovalApp / BitstreamExtractorApp / StreamMergeApp roles)."""
import numpy as np

from vvctpu.core import bitstream as bs
from vvctpu.io.streamtools import (extract_layer, extract_sublayer,
                                   merge_layers, remove_sei, stream_info)
from vvctpu.spec import sequence as seq

from test_inter_parity import motion_frames


def test_remove_sei_keeps_decodability():
    frames = motion_frames(3, 64, 64, seed=60)
    data, recons, _ = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, intra_period=0))
    stripped = remove_sei(data)
    assert len(stripped) < len(data)
    assert not any(n.nal_type in (bs.NAL_PREFIX_SEI, bs.NAL_SUFFIX_SEI)
                   for n in bs.read_annexb(stripped))
    out, _ = seq.decode_sequence(stripped, check_hash=True)  # no SEI: noop
    for poc in range(3):
        for c in range(3):
            assert np.array_equal(out[poc][c], recons[poc][c])


def test_remove_sei_keep_hash():
    frames = motion_frames(2, 64, 64, seed=61)
    data, _, _ = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    kept = remove_sei(data, keep_hash=True)
    assert any(n.nal_type == bs.NAL_SUFFIX_SEI
               for n in bs.read_annexb(kept))
    seq.decode_sequence(kept, check_hash=True)


def test_sublayer_extraction_decodes():
    """Hierarchical-B GOP: dropping the top temporal layer must leave a
    self-contained decodable stream with the remaining pictures intact."""
    frames = motion_frames(9, 64, 64, seed=62)
    data, recons, _ = seq.encode_sequence(
        frames, seq.EncoderConfig(qp=32, intra_period=0, gop=8))
    tids = [n.temporal_id for n in bs.read_annexb(data)
            if n.nal_type in (bs.NAL_TRAIL, bs.NAL_IDR_N_LP)]
    assert max(tids) >= 2      # hierarchy present
    sub = extract_sublayer(data, max_tid=max(tids) - 1)
    out, _ = seq.decode_sequence(sub, check_hash=True)
    assert 0 < len(out) < 9
    # every surviving picture reconstructs identically; recover the kept
    # POCs from the extracted stream itself
    from vvctpu.spec import hls
    kept = []
    for n in bs.read_annexb(sub):
        if n.nal_type in (bs.NAL_TRAIL, bs.NAL_IDR_N_LP):
            r = bs.BitReader(n.payload)
            kept.append(hls.SliceHeader.read(r).poc)
    kept = sorted(kept)
    for i, poc in enumerate(kept):
        for c in range(3):
            assert np.array_equal(out[i][c], recons[poc][c])


def test_merge_and_extract_layers_roundtrip():
    a = motion_frames(2, 64, 64, seed=63)
    b = motion_frames(2, 64, 64, seed=64)
    da, _, _ = seq.encode_sequence(a, seq.EncoderConfig(qp=32))
    db, _, _ = seq.encode_sequence(b, seq.EncoderConfig(qp=35))
    merged = merge_layers([da, db])
    layers = {n.layer_id for n in bs.read_annexb(merged)}
    assert layers == {0, 1}
    assert extract_layer(merged, 0) == da
    assert extract_layer(merged, 1) == db
    # each extracted layer decodes with hashes verified
    seq.decode_sequence(extract_layer(merged, 1), check_hash=True)


def test_stream_info_and_cli(tmp_path):
    from vvctpu.__main__ import main
    frames = motion_frames(2, 64, 64, seed=65)
    data, _, _ = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    rows = stream_info(data)
    types = [r["type"] for r in rows]
    assert "SPS" in types and "PPS" in types and "SUFFIX_SEI" in types
    p = tmp_path / "in.bin"
    p.write_bytes(data)
    po = tmp_path / "out.bin"
    assert main(["info", "-b", str(p)]) == 0
    assert main(["sei-remove", "-b", str(p), "-o", str(po)]) == 0
    assert main(["extract", "-b", str(p), "--tid", "0",
                 "-o", str(po)]) == 0
    assert main(["merge", str(p), str(p), "-o", str(po)]) == 0
