"""Device->host transfer helper.

The experimental 'axon' TPU runtime crashes the worker ("kernel fault") when
transferring certain program outputs whose chosen on-device layout has no
valid D2H path (reproduced: coding/decide.size_pass s=16 results at
1920x1088 — jax.block_until_ready succeeds, jax.device_get kills the
worker).  Routing the fetch through a jitted identity copy re-materialises
the arrays in default layout, which transfers fine.

On CPU (tests, virtual mesh) the copy is skipped — the bug is a TPU-runtime
artefact and the extra pass would only cost time.
"""
from __future__ import annotations


def device_get(arrs):
    """jax.device_get over a flat list of jax arrays (numpy passthrough),
    with the axon layout-normalising copy on TPU backends."""
    import jax

    if jax.default_backend() != "cpu" and any(
            isinstance(a, jax.Array) for a in arrs):
        idx = [i for i, a in enumerate(arrs) if isinstance(a, jax.Array)]
        copied = jax.jit(lambda xs: [x + 0 for x in xs])(
            [arrs[i] for i in idx])
        arrs = list(arrs)
        for i, c in zip(idx, copied):
            arrs[i] = c
    return jax.device_get(arrs)
