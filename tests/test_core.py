"""ROM / bitstream / VLC unit tests (SURVEY.md §4 property-test strategy)."""
import numpy as np
import pytest

from vvctpu.core import bitstream as bs
from vvctpu.core import rom


class TestRom:
    def test_dct2_orthogonality(self):
        for n in rom.TR_SIZES:
            m = rom.tr_matrix(rom.DCT2, n).astype(np.int64)
            g = m @ m.T
            diag = np.diag(g).astype(np.float64)
            off = np.abs(g - np.diag(np.diag(g))).max()
            assert np.allclose(diag, 64 * 64 * n, rtol=0.02)
            assert off < diag.min() * 0.02

    def test_dst7_dct8_values(self):
        assert rom.tr_matrix(rom.DST7, 4)[0].tolist() == [29, 55, 74, 84]
        assert rom.tr_matrix(rom.DCT8, 4)[0].tolist() == [84, 74, 55, 29]

    def test_dc_row(self):
        for n in rom.TR_SIZES:
            assert (rom.tr_matrix(rom.DCT2, n)[0] == 64).all()

    def test_scan_order_covers_block(self):
        for lw, lh in [(2, 2), (3, 3), (4, 4), (5, 5), (3, 2)]:
            s = rom.scan_order(lw, lh)
            assert len(s) == (1 << lw) * (1 << lh)
            assert len({(x, y) for x, y in s.tolist()}) == len(s)
            assert tuple(s[0]) == (0, 0)

    def test_angles_symmetry(self):
        a = rom.INTRA_PRED_ANGLE
        assert a[2] == 32 and a[18] == 0 and a[34] == -32
        assert a[50] == 0 and a[66] == 32
        for m in range(2, 34):
            assert a[m] == a[68 - m], m  # symmetry around the diagonal pair

    def test_filters_sum(self):
        assert (rom.intra_filter_4tap(False).sum(1) == 64).all()
        assert (rom.intra_filter_4tap(True).sum(1) == 64).all()
        assert (rom.mc_filter_luma().sum(1) == 64).all()
        assert (rom.mc_filter_chroma().sum(1) == 64).all()


class TestBitstream:
    def test_vlc_roundtrip(self):
        w = bs.BitWriter()
        ue_vals = [0, 1, 2, 5, 31, 255, 100000]
        se_vals = [0, 1, -1, 7, -200, 4096]
        for v in ue_vals:
            w.ue(v)
        for v in se_vals:
            w.se(v)
        w.u(0x2A5, 10)
        w.byte_align()
        r = bs.BitReader(w.getvalue())
        assert [r.ue() for _ in ue_vals] == ue_vals
        assert [r.se() for _ in se_vals] == se_vals
        assert r.u(10) == 0x2A5
        r.byte_align()

    def test_emulation_prevention(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            payload = bytes(rng.integers(0, 4, rng.integers(1, 64)).tolist())
            assert bs.ebsp_to_rbsp(bs.rbsp_to_ebsp(payload)) == payload
        tricky = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 3, 0, 0])
        eb = bs.rbsp_to_ebsp(tricky)
        assert b"\x00\x00\x00" not in eb[:-1] or eb.endswith(b"\x00\x00")
        assert bs.ebsp_to_rbsp(eb) == tricky

    def test_annexb_roundtrip(self):
        payloads = [bytes([0, 0, 1, 2, 3]) + b"\x80",
                    b"hello\x80", bytes(range(20)) + b"\x80"]
        nals = [bs.NalUnit(t, p) for t, p in
                zip([bs.NAL_SPS, bs.NAL_PPS, bs.NAL_IDR_N_LP], payloads)]
        back = bs.read_annexb(bs.write_annexb(nals))
        assert [n.nal_type for n in back] == [n.nal_type for n in nals]
        assert [n.payload for n in back] == payloads
