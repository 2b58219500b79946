"""Test env: force JAX onto CPU with an 8-device virtual mesh.

The real TPU chip is reserved for bench runs; tests exercise identical code on
the CPU backend (SURVEY.md §7.3.6).  Note the axon sitecustomize registers the
TPU plugin and programmatically sets jax_platforms="axon,cpu", so the env var
alone is not enough — the config update below is what actually pins CPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fused wavefront engine compiles one
# large program per (geometry, toolset); on the 2-vCPU test box that
# dominates suite time unless cached across tests AND runs.
import os as _os

_cache = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), ".jax_cache_cpu")
_os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Quick tier: `python -m pytest -m quick` — a <10-min smoke set touching
# every layer (core/bitstream, CABAC + native tier, transforms, one
# end-to-end roundtrip, wave engines, shard invariance).  The full suite
# stays the release gate.
# ---------------------------------------------------------------------------
import pytest as _pytest

_QUICK_FILES = {
    "test_core.py", "test_cabac.py", "test_native_residual.py",
    "test_spec_tools.py", "test_streamtools.py", "test_filmgrain.py",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        if it.fspath.basename in _QUICK_FILES:
            it.add_marker(_pytest.mark.quick)
