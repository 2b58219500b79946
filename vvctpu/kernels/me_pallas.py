"""Pallas TPU kernel for the dense integer-ME SAD map (SURVEY §2.9
"RdCostX86 SAD" row; VTM:EncoderLib/InterSearch.cpp xTZSearch analog).

The XLA lax.scan version in coding/me.py re-reads the full reference
plane from HBM for every offset (1089 × ~8 MB at 1080p — measured ~0.8 s
per reference, ~45× off the HBM-bandwidth roofline).  This kernel
processes one 64-px row strip per grid step: the strip's shifted
reference rows stream through a double-buffered VMEM window (33 DMAs per
strip ≈ 1.5× the frame in total HBM traffic) and all (2R+1)^2 offsets
are evaluated from VMEM with VPU-only integer arithmetic:

* row 8-sums via a sublane-split reshape (Mosaic-legal),
* column 8/16/32 windowed sums via a positive-shift pltpu.roll tree
  (valid at the block-aligned lanes; Mosaic has no strided lane ops),
* running strict-less argmin at full lane resolution, compacted once per
  strip by a transpose + sublane-split select.

Integer semantics are bit-identical to coding/me.py's dense stage (and
the spec model): cost = (SAD << 8) + lam * (2 + 2*bitlen(dx) +
2*bitlen(dy)), running strict-less min in row-major (dy, dx) offset
order (first-min tie-break).  tests/test_me_pallas.py checks equality
against the lax.scan path per key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.inter import ME_RANGE

I32MAX = np.iinfo(np.int32).max

# key -> (block h, block w, stride y, stride x, offset y, offset x) in px,
# matching coding/me.py _ME_FACT / _TT_AGG on the 8-px granule grid
_KEY_GEOM = {
    8: (8, 8, 8, 8, 0, 0),
    16: (16, 16, 16, 16, 0, 0),
    32: (32, 32, 32, 32, 0, 0),
    (16, 8): (8, 16, 8, 16, 0, 0),
    (8, 16): (16, 8, 16, 8, 0, 0),
    (32, 16): (16, 32, 16, 32, 0, 0),
    (16, 32): (32, 16, 32, 16, 0, 0),
    (32, 8): (8, 32, 8, 32, 0, 0),
    (8, 32): (32, 8, 32, 8, 0, 0),
    "tth_mid": (16, 32, 32, 32, 8, 0),
    "ttv_mid": (32, 16, 32, 32, 0, 8),
}

TY = 64          # strip height: every padded frame is a multiple of 64


import functools


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def _align_ref(refp, *, rows: int, cols: int):
    """Pad the reference to the kernel's (rows, cols) aligned footprint.

    Jitted: an eager pad/update dispatched per call measured ~1.2 s on
    the axon tunnel (vs 0.4 ms under jit) — see round-5 perf notes."""
    return jax.lax.dynamic_update_slice(
        jnp.zeros((rows, cols), jnp.int32),
        refp.astype(jnp.int32), (0, 0))


def _bitlen_static(v: int) -> int:
    return int(abs(int(v))).bit_length()


def _bitlen_j(v):
    """Threshold-sum bit length on a traced scalar (== spec bitlen_int)."""
    v = jnp.abs(v)
    return sum((v >= (1 << k)).astype(jnp.int32) for k in range(15))


def me_sad_pallas(orig, refp, lam, *, frame_h: int, frame_w: int,
                  keys: tuple, interpret: bool = False):
    """Dense +-ME_RANGE SAD argmin for every aggregation key at once.

    orig: (H, W) int32; refp: (H + 2R, W + 2R) int32 (R = ME_RANGE,
    edge-padded reference); lam: int32 scalar (traced ok).  Returns a
    tuple per key of (cost, dx, dy), each (nby, nbx) int32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = frame_h, frame_w
    R = ME_RANGE
    gy = H // TY
    n_dx = 2 * R + 1
    # lane-align the reference width (Mosaic DMA slices must be 128-lane
    # aligned); the pad tail is never read (dxi + W <= W + 2R)
    Wp = -(-(W + 2 * R) // 128) * 128

    geoms = [_KEY_GEOM[k] for k in keys]
    rowshapes = []       # per-key (rows per strip, full row width) blocks
    for (bh, bw, sy, sx, oy, ox) in geoms:
        assert TY % sy == 0, (TY, sy)
        rowshapes.append((TY // sy, (W - ox - bw) // sx + 1))

    xbits = tuple(2 + 2 * _bitlen_static(dx) for dx in range(-R, R + 1))
    n_keys = len(keys)
    # which row-variant and column-window each key consumes; the
    # (rows-per-strip, valid-lane position) pair drives the compaction
    kplans = []
    for (bh, bw, sy, sx, oy, ox) in geoms:
        kplans.append((bh, oy, bw, sx, ox + bw - 1))

    # sublane offsets of each key's rows inside the three state slabs
    offs = []
    o = 0
    for (bh, bw, sy, sx, oy, ox) in geoms:
        offs.append(o)
        o += TY // sy
    SR = o

    def kernel(lam_ref, orig_ref, ref_hbm, *rest):
        out_refs = rest[:3 * n_keys]
        row_scr, st_c, st_x, st_y, sems = rest[3 * n_keys:]
        i = pl.program_id(0)

        def dma_for(dyi, slot):
            # HBM slice starts must be sublane-tile (8) aligned: copy an
            # 8-row-padded window from the aligned base and select the
            # residual shift with a static-slice switch in dy_body
            base = i * TY + (dyi // 8) * 8
            return pltpu.make_async_copy(
                ref_hbm.at[pl.ds(base, TY + 8), :],
                row_scr.at[slot], sems.at[slot])

        dma_for(0, 0).start()
        ob = orig_ref[:]

        st_c[:] = jnp.full((SR, W), I32MAX, jnp.int32)
        st_x[:] = jnp.zeros((SR, W), jnp.int32)
        st_y[:] = jnp.zeros((SR, W), jnp.int32)

        lamv = lam_ref[0]

        def wsum(x, width):
            # x (r, W): out[., x] = sum x[., x-width+1 .. x] (wrap-
            # contaminated lanes < width-1 are never selected)
            s = x
            sh = 1
            while sh < width:
                s = s + pltpu.roll(s, sh, 1)
                sh *= 2
            return s

        def dy_body(dyi, _):
            dy = dyi - R
            ybits = 2 * _bitlen_j(dy)
            slot = dyi % 2

            @pl.when(dyi + 1 < n_dx)
            def _():
                dma_for(dyi + 1, 1 - slot).start()
            dma_for(dyi, slot).wait()
            rows0 = jax.lax.switch(
                dyi % 8,
                [lambda k=k: row_scr[slot, k:k + TY, :] for k in range(8)])

            def dx_body(dxi, rows):
                win = rows[:, :W]
                d = jnp.abs(ob - win)
                r1 = d.reshape(TY // 8, 8, W).sum(1, dtype=jnp.int32)
                rvar = {8: r1}

                def rv_get(kk):
                    # lazily build only the row variants the key set uses
                    if kk not in rvar:
                        if kk == 16:
                            rvar[16] = r1.reshape(TY // 16, 2, W).sum(
                                1, dtype=jnp.int32)
                        elif kk == 32:
                            rvar[32] = rv_get(16).reshape(
                                TY // 32, 2, W).sum(1, dtype=jnp.int32)
                        else:   # TT middle stripes: granule rows 1..2
                            rvar["tt"] = r1.reshape(
                                TY // 32, 4, W)[:, 1:3, :].sum(
                                    1, dtype=jnp.int32)
                    return rvar[kk]
                wcache = {}
                dx = dxi - R
                cb = (2 + 2 * _bitlen_j(dx)) + ybits
                costs = []
                for kidx, (bh, oy, bw, sx, pos) in enumerate(kplans):
                    wk = ("tt" if oy else bh, bw)
                    if wk not in wcache:
                        wcache[wk] = wsum(rv_get(wk[0]), bw)
                    costs.append((wcache[wk] << 8) + lamv * cb)
                # ONE state update for every key: per-key ref round trips
                # measured ~6 us/offset of pure latency
                cost = (jnp.concatenate(costs, axis=0) if len(costs) > 1
                        else costs[0])
                bc = st_c[:]
                better = cost < bc
                st_c[:] = jnp.where(better, cost, bc)
                st_x[:] = jnp.where(better, dx, st_x[:])
                st_y[:] = jnp.where(better, dy, st_y[:])
                # slide the window one column left for the next dx
                return pltpu.roll(rows, Wp - 1, 1)

            jax.lax.fori_loop(0, n_dx, dx_body, rows0)
            return 0

        jax.lax.fori_loop(0, n_dx, dy_body, 0)

        # compact: pick the valid lane (x = sx*b + ox + bw - 1) per block
        for kidx, (bh, oy, bw, sx, pos) in enumerate(kplans):
            nr, nbx = rowshapes[kidx]
            o0 = offs[kidx]
            nbp = -(-nbx // 128) * 128
            st = jnp.concatenate([st_c[o0:o0 + nr, :], st_x[o0:o0 + nr, :],
                                  st_y[o0:o0 + nr, :]], axis=0)
            t3 = st.T.reshape(W // sx, sx, 3 * nr)
            t = jax.lax.slice(t3, (0, pos, 0),
                              (W // sx, pos + 1, 3 * nr)
                              ).reshape(W // sx, 3 * nr)
            sel = t.T                                 # (3nr, W//sx)
            if W // sx < nbp:                         # lane-align (128)
                sel = jnp.pad(sel, ((0, 0), (0, nbp - W // sx)))
            else:
                sel = sel[:, :nbp]
            out_refs[3 * kidx][:] = sel[:nr].reshape(1, nr, nbp)
            out_refs[3 * kidx + 1][:] = sel[nr:2 * nr].reshape(1, nr, nbp)
            out_refs[3 * kidx + 2][:] = sel[2 * nr:].reshape(1, nr, nbp)

    out_shapes = []
    out_specs = []
    for kidx, (bh, bw, sy, sx, oy, ox) in enumerate(geoms):
        nby = (H - oy - bh) // sy + 1
        nbx = (W - ox - bw) // sx + 1
        tby, tbx = rowshapes[kidx]
        assert nby == gy * tby and nbx == tbx, (keys[kidx], nby, nbx)
        nbp = -(-nbx // 128) * 128
        for _ in range(3):
            # leading strip axis keeps the trailing two block dims equal
            # to the array dims; lane dim padded to a 128 multiple —
            # unaligned output copy-out measured ~25 ms per block (!)
            out_shapes.append(jax.ShapeDtypeStruct((gy, tby, nbp),
                                                   jnp.int32))
            out_specs.append(pl.BlockSpec(
                (1, tby, nbp), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM))

    fn = pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TY, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 8, Wp), jnp.int32),
            pltpu.VMEM((SR, W), jnp.int32),
            pltpu.VMEM((SR, W), jnp.int32),
            pltpu.VMEM((SR, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    # +8 junk tail rows: the aligned-base DMA window may overrun by up
    # to 8 rows at the bottom strip (never selected by the shift switch)
    if refp.shape == (H + 2 * R + 8, Wp):
        refp_al = refp.astype(jnp.int32)      # caller pre-aligned
    else:
        refp_al = _align_ref(refp, rows=H + 2 * R + 8, cols=Wp)
    outs = fn(jnp.asarray(lam, jnp.int32).reshape(1),
              orig.astype(jnp.int32), refp_al)
    res = []
    for kidx in range(n_keys):
        nbx = rowshapes[kidx][1]
        res.append(tuple(
            outs[3 * kidx + j].reshape(-1, outs[3 * kidx + j].shape[2])
            [:, :nbx] for j in range(3)))
    return tuple(res)
