"""Device mesh + sharded encode steps — the distribution layer.

The reference has NO communication backend (SURVEY.md §2.11: VTM is single
process; cross-machine parallel is file-level Parcat).  This layer is the
TPU-native design the survey specifies: a (gop, tile) mesh where

* the ``gop`` axis is data-parallel over frames (Parcat/GOP-chunk analog,
  DCN-friendly: no cross-talk),
* the ``tile`` axis shards intra-frame work (tile/subpicture analog, ICI:
  block batches for the decision pass, halo exchanges for loop filters).

Collectives are XLA-inserted from sharding annotations (psum for frame
statistics) plus an explicit shard_map ppermute halo exchange used by the
cross-tile loop-filter path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..coding import decide as jdecide
from ..kernels import intra_pred


def make_mesh(n_devices: int | None = None, gop: int | None = None):
    """Build a (gop, tile) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # single-chip environment: fall back to the virtual CPU devices
        # (driver dryrun / tests use xla_force_host_platform_device_count)
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    devs = devs[:n]
    if gop is None:
        gop = 2 if n % 2 == 0 and n > 1 else 1
    tile = n // gop
    arr = np.array(devs).reshape(gop, tile)
    return Mesh(arr, ("gop", "tile"))


@functools.partial(jax.jit, static_argnames=("s", "frame_w", "frame_h",
                                             "bd"))
def _block_costs(bufs, coords, lam, *, s: int, frame_w: int, frame_h: int,
                 bd: int = 8):
    """(F, NB) costs + modes for blocks at ``coords`` over frame batch.

    bufs: (F, Hb, Wb) margin-padded original planes (replicated over tile);
    coords: (NB, 2) block origins (sharded over tile).
    """
    modes = jnp.arange(67, dtype=jnp.int32)
    bit_cost = (jnp.asarray(jdecide._MODE_BITS[:67])
                * jnp.asarray(lam, jnp.int32))

    def per_frame(buf):
        def per_block(xy):
            top, left = intra_pred.build_references(
                buf, xy[0], xy[1], s=s, is_luma=True, frame_w=frame_w,
                frame_h=frame_h, n_ctu_x=frame_w // 64, bd=bd,
                in_frame_only=True)
            blk = jax.lax.dynamic_slice(buf, (xy[1] + 1, xy[0] + 1), (s, s))

            def per_mode(m):
                pred = intra_pred.predict(top, left, m, s=s, is_luma=True,
                                          bd=bd)
                return jdecide._satd(blk - pred, s)

            satds = jax.vmap(per_mode)(modes)
            costs = (satds << 8) + bit_cost
            best = jnp.argmin(costs)
            return costs[best], best.astype(jnp.int32)

        return jax.vmap(per_block)(coords)

    return jax.vmap(per_frame)(bufs)


def parallel_decide_step(mesh: Mesh, frames_y: np.ndarray, lam: int,
                         s: int = 8, bd: int = 8):
    """Sharded multi-frame decision pass: frames over ``gop``, blocks over
    ``tile``; returns ((F, NB) costs, (F, NB) modes, scalar total cost).

    The scalar reduction crosses both axes -> XLA inserts the psum.
    """
    f, h, w = frames_y.shape
    bufs = np.zeros((f, h + 1 + intra_pred.MARGIN,
                     w + 1 + intra_pred.MARGIN), np.int32)
    bufs[:, 1:h + 1, 1:w + 1] = frames_y
    nbx, nby = w // s, h // s
    gx, gy = np.meshgrid(np.arange(nbx) * s, np.arange(nby) * s)
    coords = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.int32)

    buf_sh = jax.device_put(bufs, NamedSharding(mesh, P("gop", None, None)))
    coord_sh = jax.device_put(coords, NamedSharding(mesh, P("tile", None)))

    costs, best = _block_costs(buf_sh, coord_sh, np.int32(lam), s=s,
                               frame_w=w, frame_h=h, bd=bd)
    total = jnp.sum(costs.astype(jnp.int64) if costs.dtype == jnp.int64
                    else costs)
    return costs, best, total


def halo_exchange_columns(mesh: Mesh, x, halo: int = 4):
    """Ring-exchange boundary columns between tile-neighbours (shard_map +
    ppermute) — the CP/ring-attention analog of SURVEY.md §2.10: loop filters
    and motion search windows need neighbouring tiles' edge pixels.

    x: (H, W) plane sharded column-wise over ``tile``.  Returns
    (left_halo, right_halo) received from the neighbours, each (H, halo) per
    shard.
    """
    ntile = mesh.shape["tile"]

    def body(xs):
        left_edge = xs[:, :halo]
        right_edge = xs[:, -halo:]
        right_perm = [(i, (i + 1) % ntile) for i in range(ntile)]
        left_perm = [(i, (i - 1) % ntile) for i in range(ntile)]
        from_left = jax.lax.ppermute(right_edge, "tile", right_perm)
        from_right = jax.lax.ppermute(left_edge, "tile", left_perm)
        return from_left, from_right

    fn = jax.shard_map(body, mesh=mesh, in_specs=P(None, "tile"),
                       out_specs=(P(None, "tile"), P(None, "tile")))
    return fn(x)
