"""ctypes bindings for the native CABAC packer/decoder (native/cabac.c).

Byte-identical to the Python engine; loaded lazily, with a documented Python
fallback when the .so has not been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from . import contexts as C

_LIB = None
_TRIED = False
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                   "libvvctpu_cabac.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        lib = ctypes.CDLL(os.path.abspath(_SO))
    except OSError:
        _LIB = None
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.vvc_pack_bins.restype = ctypes.c_int64
    lib.vvc_pack_bins.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                  i32p, i32p, i32p, i32p,
                                  u8p, ctypes.c_int64]
    lib.vvc_dec_sizeof.restype = ctypes.c_int64
    lib.vvc_dec_init.restype = None
    lib.vvc_dec_init.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    for name in ("vvc_dec_bin",):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p, i32p, i32p,
                       i32p]
    lib.vvc_dec_bypass.restype = ctypes.c_int32
    lib.vvc_dec_bypass.argtypes = [ctypes.c_void_p]
    lib.vvc_dec_bypass_bits.restype = ctypes.c_int32
    lib.vvc_dec_bypass_bits.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.vvc_dec_terminate.restype = ctypes.c_int32
    lib.vvc_dec_terminate.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pack_bins(arr: np.ndarray, slice_type: int, qp: int) -> bytes:
    """arr: (N, 3) int32 [kind, ctx, bin].  Returns the codeword bytes."""
    lib = _load()
    st = C.make_ctx_state(slice_type, qp)
    kinds = np.ascontiguousarray(arr[:, 0])
    ctxs = np.ascontiguousarray(arr[:, 1])
    bins = np.ascontiguousarray(arr[:, 2])
    n = len(arr)
    out = np.zeros(n + 4096, np.uint8)
    wrote = lib.vvc_pack_bins(
        _i32p(kinds), _i32p(ctxs), _i32p(bins), n,
        _i32p(st.p0), _i32p(st.p1), _i32p(st.sh0), _i32p(st.sh1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(out))
    if wrote < 0:
        raise RuntimeError("native packer overflow")
    return out[:wrote].tobytes()


class NativeDecoder:
    """CabacDecoder-compatible wrapper over the C decode engine."""

    def __init__(self, ctx_state, data: bytes):
        self.lib = _load()
        self.ctx = ctx_state
        self._data = np.frombuffer(data, np.uint8).copy()
        self._dec = ctypes.create_string_buffer(
            int(self.lib.vvc_dec_sizeof()))
        self.lib.vvc_dec_init(
            self._dec, self._data.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)), len(self._data))

    def bin(self, ctx_id: int) -> int:
        st = self.ctx
        return int(self.lib.vvc_dec_bin(self._dec, ctx_id, _i32p(st.p0),
                                        _i32p(st.p1), _i32p(st.sh0),
                                        _i32p(st.sh1)))

    def bypass(self) -> int:
        return int(self.lib.vvc_dec_bypass(self._dec))

    def bypass_bits(self, n: int) -> int:
        return int(self.lib.vvc_dec_bypass_bits(self._dec, n))

    def terminate(self) -> int:
        return int(self.lib.vvc_dec_terminate(self._dec))


def pack_bins_state(arr: np.ndarray, st, snap_idx: int = -1):
    """Pack with an explicit CtxState (mutated in place).  Returns
    (payload_bytes, (snap_p0, snap_p1) | None) — snapshot taken after
    consuming ``snap_idx`` bins (WPP context inheritance)."""
    lib = _load()
    lib2 = getattr(lib, "vvc_pack_bins_snap", None)
    kinds = np.ascontiguousarray(arr[:, 0])
    ctxs = np.ascontiguousarray(arr[:, 1])
    bins = np.ascontiguousarray(arr[:, 2])
    n = len(arr)
    out = np.zeros(n + 4096, np.uint8)
    nctx = len(st.p0)
    sp0 = np.zeros(nctx, np.int32)
    sp1 = np.zeros(nctx, np.int32)
    if lib2 is None:
        raise RuntimeError("rebuild native lib for WPP support")
    lib2.restype = ctypes.c_int64
    wrote = lib2(
        _i32p(kinds), _i32p(ctxs), _i32p(bins), ctypes.c_int64(n),
        _i32p(st.p0), _i32p(st.p1), _i32p(st.sh0), _i32p(st.sh1),
        ctypes.c_int64(snap_idx), ctypes.c_int32(nctx),
        _i32p(sp0), _i32p(sp1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(out)))
    if wrote < 0:
        raise RuntimeError("native packer overflow")
    snap = (sp0, sp1) if snap_idx >= 0 else None
    return out[:wrote].tobytes(), snap


def _res_cfg():
    return np.asarray([C.LAST_X.offset, C.LAST_Y.offset, C.CG_FLAG.offset,
                       C.SIG_FLAG.offset, C.GT1_FLAG.offset,
                       C.PAR_FLAG.offset, C.GT3_FLAG.offset,
                       C.SIG_CHROMA_BASE, C.GTX_CHROMA_BASE], np.int32)


_SCANS: dict = {}


def _scan(log2_w, log2_h):
    key = (log2_w, log2_h)
    if key not in _SCANS:
        from ..core import rom
        _SCANS[key] = np.ascontiguousarray(
            rom.scan_order(log2_w, log2_h).astype(np.int32))
    return _SCANS[key]


def tb_bins_c(levels: np.ndarray, log2_w: int, log2_h: int,
              is_chroma: bool) -> np.ndarray:
    """(n, 3) int32 bins for one TB via the C binarizer (== binarize.tb_bins
    output order)."""
    lib = _load()
    n = levels.size
    cap = 16 * n + 256
    kinds = np.empty(cap, np.int32)
    ctxs = np.empty(cap, np.int32)
    bins = np.empty(cap, np.int32)
    work = np.empty(3 * n + 64, np.int32)
    lev = np.ascontiguousarray(levels, np.int32)
    lib.vvc_tb_bins.restype = ctypes.c_int64
    wrote = lib.vvc_tb_bins(
        _i32p(lev), ctypes.c_int(log2_w), ctypes.c_int(log2_h),
        ctypes.c_int(int(is_chroma)), _i32p(_scan(log2_w, log2_h)),
        _i32p(_res_cfg()), _i32p(kinds), _i32p(ctxs), _i32p(bins),
        ctypes.c_int64(cap), _i32p(work))
    out = np.empty((wrote, 3), np.int32)
    out[:, 0] = kinds[:wrote]
    out[:, 1] = ctxs[:wrote]
    out[:, 2] = bins[:wrote]
    return out


def native_parse_tb(dec: "NativeDecoder", log2_w: int, log2_h: int,
                    is_chroma: bool) -> np.ndarray:
    """Parse one TB directly in C through the native decode engine."""
    lib = _load()
    w, h = 1 << log2_w, 1 << log2_h
    n = w * h
    out = np.empty(n, np.int32)
    work = np.empty(3 * n + 64, np.int32)
    st = dec.ctx
    lib.vvc_tb_parse.restype = None
    lib.vvc_tb_parse(
        dec._dec, _i32p(st.p0), _i32p(st.p1), _i32p(st.sh0), _i32p(st.sh1),
        ctypes.c_int(log2_w), ctypes.c_int(log2_h),
        ctypes.c_int(int(is_chroma)), _i32p(_scan(log2_w, log2_h)),
        _i32p(_res_cfg()), _i32p(out), _i32p(work))
    return out.reshape(h, w)
