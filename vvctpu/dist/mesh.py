"""Device mesh + sharded encode steps — the distribution layer.

The reference has NO communication backend (SURVEY.md §2.11: VTM is single
process; cross-machine parallel is file-level Parcat).  This layer is the
TPU-native design the survey specifies: a (gop, tile) mesh where

* the ``gop`` axis is data-parallel over frames (Parcat/GOP-chunk analog,
  DCN-friendly: no cross-talk),
* the ``tile`` axis shards intra-frame work (tile/subpicture analog, ICI):
  ``dist/shard.py sharded_tile_scan`` runs one tile per device over it.

Collectives are XLA-inserted from sharding annotations; loop filters run
centrally on the gathered frame (cross-tile filtering needs both sides'
pixels — a shard_map ppermute halo-exchange variant is future work, not
claimed here).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host entry point: initialise jax.distributed when launched
    across hosts (pod slice / DCN GOP parallelism), no-op single-host.

    Returns this host's process index.  The GOP axis then maps to hosts
    via dist.gop.segment_for_process (closed-GOP segments, Parcat-style —
    SURVEY.md §3.5), and the tile axis to each host's local devices; no
    cross-host traffic is needed for the GOP axis beyond bitstream gather.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


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
