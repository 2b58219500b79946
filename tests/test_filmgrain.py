"""Film-grain SEI + synthesis (SURVEY §2.8 SEIFilmGrain role)."""
import numpy as np

from vvctpu.io import filmgrain as fg
from vvctpu.spec import sequence as seq

from test_mtt import textured


def test_fgc_sei_roundtrip():
    payload = fg.write_fgc_sei(6, 12345, [(0, 99, 8), (100, 255, 20)])
    assert fg.parse_fgc_sei(payload) == (6, 12345, [(0, 99, 8),
                                                    (100, 255, 20)])


def test_add_find_and_synthesize():
    frames = [textured(64, 64, seed=31)]
    data, recons, _ = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    data2 = fg.add_fgc(data, 6, 7, [(0, 255, 16)])
    assert fg.find_fgc(data) is None
    params = fg.find_fgc(data2)
    assert params == (6, 7, [(0, 255, 16)])
    # grained stream still decodes bit-exact (SEI is display-side only)
    out, sps = seq.decode_sequence(data2, check_hash=True)
    for c in range(3):
        assert np.array_equal(out[0][c], recons[0][c])
    g1 = fg.synthesize(out, params, sps.bit_depth)
    g2 = fg.synthesize(out, params, sps.bit_depth)
    for c in range(3):
        assert np.array_equal(g1[0][c], g2[0][c])     # deterministic
    assert not np.array_equal(g1[0][0], out[0][0])    # grain applied
    assert g1[0][0].min() >= 0 and g1[0][0].max() <= 255


def test_gain_zero_is_identity_on_luma():
    frames = [textured(64, 64, seed=32)]
    _, recons, _ = seq.encode_sequence(frames, seq.EncoderConfig(qp=32))
    g = fg.synthesize(recons, (6, 3, [(0, 255, 0)]), 8)
    assert np.array_equal(g[0][0], recons[0][0])


def test_hash_sei_types():
    from vvctpu.spec import hls
    frames = [textured(64, 64, seed=33)]
    for ht in (0, 1, 2):
        cfg = seq.EncoderConfig(qp=32, hash_type=ht)
        data, recons, _ = seq.encode_sequence(frames, cfg)
        out, _ = seq.decode_sequence(data, check_hash=True)
        assert np.array_equal(out[0][0], recons[0][0])
        # corrupt the digest -> decode must fail loudly
        from vvctpu.core import bitstream as bs
        nals = bs.read_annexb(data)
        for n in nals:
            if n.nal_type == bs.NAL_SUFFIX_SEI:
                p = bytearray(n.payload)
                p[4] ^= 0xFF      # inside the first plane's digest
                n.payload = bytes(p)
        bad = bs.write_annexb(nals)
        try:
            seq.decode_sequence(bad, check_hash=True)
            raise AssertionError("corrupted hash not detected")
        except ValueError:
            pass
