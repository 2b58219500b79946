"""Tile-sharded execution of the REAL encoder/decoder frame scan.

SURVEY.md §2.10 maps VVC tiles to the mesh's ``tile`` axis ("shard tiles
across chips").  This module realises it for the actual pipeline engine:
``sharded_tile_scan`` runs every tile's (phase-A inter batch + fused
wavefront scan) concurrently, one tile per device, via ``jax.shard_map``
over the mesh ``tile`` axis.  Per-tile wave schedules stay divergent at
runtime — ``lax.switch`` on the shard-local class index executes only that
device's branch — so no vmap branch blow-up.

Byte-exactness contract: the per-tile computation is the identical traced
program the sequential tile loop runs (same leaf bodies, same schedules,
nop-padded), so the assembled frame and the resulting bitstream are
byte-equal to the 1-device encode — the SURVEY.md §4 item-6 shard-invariance
gate, enforced by tests/test_shard.py and __graft_entry__.dryrun_multichip.

Activation: ``with use_mesh(mesh): encode_sequence(...)`` (or decode);
pipeline/encoder._run_scan picks this path up automatically when the tile
grid is uniform and a mesh is active.

Reference: VTM has no equivalent (single-threaded; SURVEY.md §2.11 states
the communication layer is new design, not ported behaviour).
"""
from __future__ import annotations

import contextlib
import contextvars
import functools

import numpy as np

_ACTIVE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "vvctpu_mesh", default=None)


def active_mesh():
    return _ACTIVE_MESH.get()


@contextlib.contextmanager
def use_mesh(mesh):
    """Activate a (…, 'tile') mesh for pipeline tile sharding."""
    tok = _ACTIVE_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.reset(tok)


_INTER_KEYS = (8, 16, 32)


def _stack_schedules(scheds):
    """Pad per-tile (wcls, wrows) to a common step count with nop steps and
    stack -> ((T, n) int32, (T, n, K, 16) int32)."""
    n_max = max(wc.shape[0] for wc, _ in scheds)
    K = scheds[0][1].shape[1]
    wcs, wrs = [], []
    for wc, wr in scheds:
        pad = n_max - wc.shape[0]
        if pad:
            dummy = np.zeros((pad, K, 16), np.int32)
            dummy[:, :, 1] = dummy[:, :, 2] = 1 << 20
            wc = np.concatenate([wc, np.zeros(pad, np.int32)])
            wr = np.concatenate([wr, dummy], axis=0)
        wcs.append(wc)
        wrs.append(wr)
    return np.stack(wcs), np.stack(wrs)


def sharded_tile_scan(mesh, tiles, tw: int, th: int, refs, scan_kw: dict):
    """Run every tile's frame scan concurrently over the mesh 'tile' axis.

    tiles: list of per-tile dicts with keys
        slots       (N, 16) int32 coding-order slot rows
        py/pcb/pcr  tile-local planes (source on encode, levels on decode)
        rox/roy     MC reference offsets (tile origin in frame coords)
        inter       {8/16/32: (B, 13)} or None
        rect        {(w, h): (B, 7)} or None          (mtt only)
        plt         (plt_y, plt_cb, plt_cr) tile slices or None
    refs: 6-tuple of margin-padded full-frame reference planes (replicated),
        or None for intra frames.
    scan_kw: the shared flag/lut kwargs of pipeline/encoder._run_scan.

    Returns a list of T result tuples, each the 11-tuple frame_wave returns
    for that tile (numpy).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..pipeline import recon, wave

    T = len(tiles)
    ntile = int(mesh.shape["tile"])
    if T != ntile:
        raise ValueError(f"{T} tiles but mesh tile axis is {ntile}")

    encode = bool(scan_kw.get("encode", False))
    bd = int(scan_kw.get("bd", 8))
    qp = int(scan_kw["qp"])
    lam_rd = int(scan_kw.get("lam_rd", 0))
    flags = {k: bool(scan_kw.get(k, False)) for k in (
        "mts", "lfnst", "cclm", "rdoq", "lmcs", "mip", "tskip", "jccr",
        "dmvr", "bdof", "ciip", "sbt", "isp", "gpm", "affine", "dq",
        "mtt", "ibc")}
    fwd_lut = scan_kw.get("fwd_lut")
    crs_lut = scan_kw.get("crs_lut")
    inter_enabled = refs is not None
    has_plt = tiles[0]["plt"] is not None

    classes = wave._fused_classes(
        isp=flags["isp"], mtt=flags["mtt"], ibc=flags["ibc"],
        plt=has_plt, ciip=flags["ciip"] and inter_enabled)
    wcls, wrows = _stack_schedules(
        [wave._fused_schedule(t["slots"], th, tw, classes) for t in tiles])

    py = np.stack([np.asarray(t["py"]) for t in tiles])
    pcb = np.stack([np.asarray(t["pcb"]) for t in tiles])
    pcr = np.stack([np.asarray(t["pcr"]) for t in tiles])
    rox = np.asarray([t["rox"] for t in tiles], np.int32)
    roy = np.asarray([t["roy"] for t in tiles], np.int32)
    inter_s = {s: np.stack([t["inter"][s] for t in tiles])
               for s in _INTER_KEYS} if inter_enabled else {}
    from ..pipeline import plan as planmod
    rect_s = {}
    if inter_enabled and flags["mtt"]:
        rect_s = {sh: np.stack([t["rect"][sh] for t in tiles])
                  for sh in planmod.RECT_SHAPES}
    if has_plt:
        plt_st = tuple(np.stack([np.asarray(t["plt"][i]) for t in tiles])
                       for i in range(3))
    else:
        plt_st = tuple(np.zeros((T, 1, 1), np.int32) for _ in range(3))

    h2, w2 = th // 2, tw // 2
    MARGIN = recon.MARGIN

    def body(py1, pcb1, pcr1, wcls1, wrows1, rox1, roy1, plt1, inters1,
             rects1, refs_r, fwd_r, crs_r):
        """shard body: leading tile axis is local size 1."""
        def mkbuf(h, w):
            return jnp.zeros((h + 1 + MARGIN, w + 1 + MARGIN), jnp.int32)

        carry = (mkbuf(th, tw), mkbuf(h2, w2), mkbuf(h2, w2),
                 jnp.zeros((th, tw), jnp.int32),
                 jnp.zeros((h2, w2), jnp.int32),
                 jnp.zeros((h2, w2), jnp.int32),
                 py1[0].astype(jnp.int32), pcb1[0].astype(jnp.int32),
                 pcr1[0].astype(jnp.int32),
                 jnp.zeros((th // 8, tw // 8), jnp.int32),
                 jnp.zeros((th // 8, tw // 8), jnp.int32),
                 jnp.zeros((th // 8, tw // 8), jnp.int32),
                 jnp.zeros((th // 8, tw // 8), jnp.int32),
                 jnp.zeros((th // 8, tw // 8), jnp.int32))
        ro_x, ro_y = rox1[0], roy1[0]
        lam32 = jnp.int32(lam_rd)
        if inter_enabled:
            for i, s_sz in enumerate(_INTER_KEYS):
                carry = recon._inter_batch_pass(
                    carry, inters1[i][0], refs_r, s_sz, qp, bd, encode,
                    tw, th, flags["rdoq"], lam32,
                    fwd_r if flags["lmcs"] else None,
                    dmvr=flags["dmvr"], bdof=flags["bdof"],
                    sbt=flags["sbt"],
                    crs_lut=crs_r if flags["lmcs"] else None,
                    gpm=flags["gpm"], affine=flags["affine"],
                    dq=flags["dq"], rox=ro_x, roy=ro_y)
            if flags["mtt"]:
                for i, (rw, rh) in enumerate(planmod.RECT_SHAPES):
                    carry = recon._inter_batch_pass_rect(
                        carry, rects1[i][0], refs_r, rw, rh, qp, bd,
                        encode, flags["rdoq"], lam32,
                        fwd_r if flags["lmcs"] else None,
                        crs_lut=crs_r if flags["lmcs"] else None,
                        dq=flags["dq"], rox=ro_x, roy=ro_y)
        carry = wave._fused_scan.__wrapped__(
            carry, wcls1[0], wrows1[0], jnp.int32(qp), lam32,
            crs_r if flags["lmcs"] else None,
            fwd_r if flags["lmcs"] else None,
            refs_r, ro_x, ro_y, tuple(p[0] for p in plt1),
            classes=classes, frame_w=tw, frame_h=th, bd=bd,
            encode=encode, mts=flags["mts"], lfnst=flags["lfnst"],
            cclm=flags["cclm"], rdoq=flags["rdoq"], mip=flags["mip"],
            tskip=flags["tskip"], jccr=flags["jccr"], dq=flags["dq"])
        by, bcb, bcr, ly, lcb, lcr = carry[:6]
        outs = (by[1:th + 1, 1:tw + 1], bcb[1:h2 + 1, 1:w2 + 1],
                bcr[1:h2 + 1, 1:w2 + 1], ly, lcb, lcr, carry[9],
                carry[10], carry[11], carry[12], carry[13])
        return tuple(o[None] for o in outs)

    if refs is None:
        z = np.zeros((1, 1), np.int32)
        refs_in = (z, z, z, z, z, z)
    else:
        refs_in = tuple(np.asarray(r) for r in refs)
    fwd_in = (np.asarray(fwd_lut) if fwd_lut is not None
              else np.zeros(1, np.int32))
    crs_in = (np.asarray(crs_lut) if crs_lut is not None
              else np.zeros(1, np.int32))
    # keep the traced body free of None-vs-array polymorphism: luts are
    # always arrays; flags['lmcs'] gates their use
    import jax
    from jax.sharding import PartitionSpec as P

    tile_sp = lambda nd: P("tile", *([None] * nd))  # noqa: E731
    repl = P()
    in_specs = (tile_sp(2), tile_sp(2), tile_sp(2), tile_sp(1), tile_sp(3),
                P("tile"), P("tile"), (tile_sp(2),) * 3,
                tuple(tile_sp(2) for _ in inter_s) or None,
                tuple(tile_sp(2) for _ in rect_s) or None,
                (repl,) * 6, repl, repl)
    out_specs = tuple([tile_sp(2)] * 11)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False))
    outs = fn(py, pcb, pcr, wcls, wrows, rox, roy, plt_st,
              tuple(inter_s[s] for s in _INTER_KEYS) if inter_s else None,
              tuple(rect_s[sh] for sh in planmod.RECT_SHAPES)
              if rect_s else None,
              refs_in, fwd_in, crs_in)
    from ..core import xfer
    outs = [np.asarray(o) for o in xfer.device_get(list(outs))]
    return [tuple(o[t] for o in outs) for t in range(T)]
