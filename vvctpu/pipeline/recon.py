"""JAX frame reconstruction scan — the conformance-path engine.

One ``lax.scan`` over coding-order slots (pipeline/plan.py); each step
dispatches via ``lax.switch`` on the leaf size class and runs the shared
predict -> (quantise) -> reconstruct chain with static shapes, updating the
margin-padded recon buffers and the level planes in place.  The same compiled
body serves the encoder (levels computed from source) and the decoder (levels
supplied from the parsed bitstream) — the encoder-embeds-the-decoder property
(SURVEY.md §1) realised as one jitted function.

Role of VTM:EncoderLib/EncSlice::compressSlice + DecoderLib/DecCu (the CTU
reconstruction loops), restructured as a static scan for XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rom
from ..kernels import intra_pred, transform
from ..spec.codec import FrameDecisions
from . import plan as planmod

MARGIN = intra_pred.MARGIN


def _leaf_component(buf, levels_io, src, x, y, s, mode, *, comp_luma: bool,
                    frame_w: int, frame_h: int, n_ctu_x: int, qp: int,
                    bd: int, encode: bool):
    """Process one component block: returns (new_buf, new_levels, lev_block).

    ``levels_io``: encode -> output plane being filled; decode -> parsed
    plane (read-only source of levels, also threaded through unchanged).
    """
    top, left = intra_pred.build_references(
        buf, x, y, s=s, is_luma=comp_luma, frame_w=frame_w, frame_h=frame_h,
        n_ctu_x=n_ctu_x, bd=bd)
    pred = intra_pred.predict(top, left, mode, s=s, is_luma=comp_luma, bd=bd)
    if encode:
        blk = jax.lax.dynamic_slice(src, (y, x), (s, s)).astype(jnp.int32)
        coef = transform.forward_transform(blk - pred, s, s, bd=bd)
        lev = transform.quantize(coef, s, s, qp, intra=True, bd=bd)
        levels_io = jax.lax.dynamic_update_slice(levels_io, lev, (y, x))
    else:
        lev = jax.lax.dynamic_slice(src, (y, x), (s, s))  # parsed levels
    rec = transform.reconstruct(pred, lev, s, s, qp, bd=bd)
    buf = jax.lax.dynamic_update_slice(buf, rec, (y + 1, x + 1))
    return buf, levels_io


def _make_leaf_fn(s: int, *, frame_w: int, frame_h: int, n_ctu_x: int,
                  qp: int, bd: int, encode: bool):
    def leaf(carry, x, y, mode):
        (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr) = carry
        by, ly = _leaf_component(
            by, ly, sy, x, y, s, mode, comp_luma=True, frame_w=frame_w,
            frame_h=frame_h, n_ctu_x=n_ctu_x, qp=qp, bd=bd, encode=encode)
        cs, cx, cy = s // 2, x // 2, y // 2
        bcb, lcb = _leaf_component(
            bcb, lcb, scb, cx, cy, cs, mode, comp_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            qp=qp, bd=bd, encode=encode)
        bcr, lcr = _leaf_component(
            bcr, lcr, scr, cx, cy, cs, mode, comp_luma=False,
            frame_w=frame_w // 2, frame_h=frame_h // 2, n_ctu_x=n_ctu_x,
            qp=qp, bd=bd, encode=encode)
        return (by, bcb, bcr, ly, lcb, lcr, sy, scb, scr)

    return leaf


@functools.partial(jax.jit,
                   static_argnames=("frame_w", "frame_h", "bd", "encode"))
def frame_scan(slots, planes_y, planes_cb, planes_cr, *, frame_w: int,
               frame_h: int, qp, bd: int, encode: bool):
    """Run the full-frame reconstruction scan.

    slots: (N, 4) int32 [op, x, y, mode] in coding order.
    planes_*: encode -> source planes; decode -> parsed level planes.
    Returns (recon_y, recon_cb, recon_cr, levels_y, levels_cb, levels_cr).
    """
    n_ctu_x = frame_w // 64
    h2, w2 = frame_h // 2, frame_w // 2

    def mkbuf(h, w):
        return jnp.zeros((h + 1 + MARGIN, w + 1 + MARGIN), jnp.int32)

    carry = (mkbuf(frame_h, frame_w), mkbuf(h2, w2), mkbuf(h2, w2),
             jnp.zeros((frame_h, frame_w), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             jnp.zeros((h2, w2), jnp.int32),
             planes_y.astype(jnp.int32), planes_cb.astype(jnp.int32),
             planes_cr.astype(jnp.int32))

    kw = dict(frame_w=frame_w, frame_h=frame_h, n_ctu_x=n_ctu_x, qp=qp,
              bd=bd, encode=encode)
    branches = [lambda c, x, y, m: c,
                _make_leaf_fn(8, **kw), _make_leaf_fn(16, **kw),
                _make_leaf_fn(32, **kw)]

    def step(carry, slot):
        op, x, y, mode = slot[0], slot[1], slot[2], slot[3]
        return jax.lax.switch(op, branches, carry, x, y, mode), None

    carry, _ = jax.lax.scan(step, carry, slots)
    by, bcb, bcr, ly, lcb, lcr = carry[:6]
    return (by[1:frame_h + 1, 1:frame_w + 1],
            bcb[1:h2 + 1, 1:w2 + 1], bcr[1:h2 + 1, 1:w2 + 1],
            ly, lcb, lcr)


def make_slots(dec: FrameDecisions, frame_h: int, frame_w: int) -> np.ndarray:
    op, xs, ys, modes = planmod.leaf_plan(dec, frame_h, frame_w)
    return np.stack([op, xs, ys, modes], axis=1).astype(np.int32)
