"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-device sharding tests follow the standard JAX pattern of faking a mesh
on CPU (SURVEY.md §4): real TPU hardware is not required for any test. Env
vars must be set before jax is imported anywhere, so this conftest is
imported first by pytest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion emitters MISCOMPILE the 3-pass shear warp when a reduction
# consumes it (one copy's boundary row zero-fills; max err 0.36 on a 0..1
# image, deterministic, survives optimization_barrier / while_loop baffles;
# TPU is unaffected). Diagnosed by flag bisection; the package __init__ sets
# the same guard. See NOTES.md "XLA:CPU fusion-emitter miscompile" and
# tests/test_xla_cpu_guard.py.
if "xla_cpu_use_fusion_emitters" not in flags:
    flags = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize registers the TPU plugin at interpreter start and
# overrides JAX_PLATFORMS, so the env var alone is not enough here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
