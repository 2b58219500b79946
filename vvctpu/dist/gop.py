"""GOP/segment-parallel encoding — the data-parallel (DP) axis.

The reference's only cross-machine scaling is file-level Parcat
(VTM:App/Parcat, SURVEY.md §3.5): independent closed-GOP segment encodes
concatenated afterwards.  Here the same axis is a first-class in-memory
path:

* ``encode_gop_parallel`` splits the sequence at closed-GOP boundaries,
  encodes each segment independently (spec or JAX engine) and concatenates
  with the Parcat logic — bit-exactly what N separate encoder runs plus
  ``vvctpu parcat`` would produce.
* On a multi-host pod slice, each host encodes ``segment_for_process()``
  (keyed by ``jax.process_index()``); only source frames flow out and
  bitstreams return — the DCN-friendly no-cross-talk pattern of
  SURVEY.md §2.11.  Hosts gather the per-segment payloads (out of band or
  via ``jax.experimental.multihost_utils``) and any one host concatenates.
* ``threads=True`` overlaps segments on one host with a thread pool: JAX
  releases the GIL during device compute, so one segment's host entropy
  packs while another's device passes run.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from ..io.parcat import parcat
from ..spec import sequence as sseq


def segment_bounds(n_frames: int, n_segments: int, gop: int):
    """Closed-GOP segment [start, end) bounds: cut points are multiples of
    the GOP size (every segment starts with an IDR in this encoder)."""
    g = max(gop, 1)
    n_units = -(-n_frames // g)
    segs = min(n_segments, n_units)
    cuts = [round(k * n_units / segs) * g for k in range(segs)] + [n_frames]
    return [(cuts[i], min(cuts[i + 1], n_frames)) for i in range(segs)
            if cuts[i] < n_frames]


def segment_for_process(n_frames: int, n_segments: int, gop: int,
                        process_index: int | None = None):
    """The [start, end) this host encodes under jax.distributed."""
    import jax
    pi = jax.process_index() if process_index is None else process_index
    bounds = segment_bounds(n_frames, n_segments, gop)
    return bounds[pi % len(bounds)]


def encode_gop_parallel(frames, cfg: sseq.EncoderConfig, segments: int = 2,
                        engine: str = "spec", threads: bool = False):
    """Encode ``frames`` as independent closed-GOP segments + concatenate.

    Returns (annexb_bytes, recon_frames, per_frame_bits) exactly like
    encode_sequence; the stream equals Parcat over per-segment encodes."""
    if engine == "jax":
        from ..pipeline import encoder as eng
    else:
        eng = sseq
    bounds = segment_bounds(len(frames), segments, cfg.gop)

    def enc(se):
        s, e = se
        return eng.encode_sequence(frames[s:e], cfg)

    if threads and len(bounds) > 1:
        with ThreadPoolExecutor(max_workers=min(4, len(bounds))) as ex:
            results = list(ex.map(enc, bounds))
    else:
        results = [enc(se) for se in bounds]
    data = parcat([r[0] for r in results])
    recons = [f for r in results for f in r[1]]
    bits = [b for r in results for b in r[2]]
    return data, recons, bits
