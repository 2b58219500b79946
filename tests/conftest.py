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
