"""Test configuration: run everything on a simulated 8-device CPU mesh.

This is the TPU-world analogue of "test multi-node without a cluster"
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8 gives
eight independent CPU devices over which jax.sharding.Mesh / pjit programs
compile and execute exactly as they would over an 8-chip ICI mesh.

Note: this environment's sitecustomize registers a remote TPU ("axon")
PJRT backend at interpreter start and exports JAX_PLATFORMS=axon, so the
env-var route is overridden before conftest runs. jax.config.update is
authoritative at first-backend-use time, so we force CPU through it; the
CPU backend initializes lazily and picks up XLA_FLAGS set here.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
