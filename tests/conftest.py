"""Test configuration: run everything on a simulated 8-device CPU mesh.

This is the TPU-world analogue of "test multi-node without a cluster"
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8 gives
eight independent CPU devices over which jax.sharding.Mesh / pjit programs
compile and execute exactly as they would over an 8-chip ICI mesh.

Must run before jax initializes its backends, hence top of conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
