"""Test env: force JAX onto CPU with an 8-device virtual mesh.

The real TPU chip is reserved for bench runs; tests exercise identical code on
the CPU backend (SURVEY.md §7.3.6 — multi-chip paths validated via
host-platform device simulation, kernels via Pallas interpret mode).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
