"""Per-executable XLA compiler options for the hot jitted functions.

Global XLA_FLAGS tuning cannot cross the axon relay (the PJRT server
parses its own argv — PERF.md §4), but compile options travel inside each
compile request via jit(fn).lower(*args).compile(compiler_options=...).

Measured verdict (PERF.md §4): on the PRODUCTION (sharded + donated)
RN50@224 train step, the compiler defaults win — the scoped-VMEM 32 MB
"+3%" from the broad flag_ab.json probe was an artifact of its unsharded
test jit; the production sweep (data/output/vmem_sweep.json) measured
32 MB at 103.5 ms vs 99.7 ms default (2,474 vs 2,567 img/s), and
dn121_levers.json independently measured 32/64 MB negative on DenseNet.
So MEASURED_TPU_OPTS is empty and Trainer executables compile plain;
the plumbing stays for per-experiment overrides.

Override with env CONVNETS_TPU_COMPILER_OPTS:
  - unset        → the measured default (none — plain jit)
  - "0"/""/"off" → plain jit (no options)
  - a JSON dict  → exactly those options
"""

from __future__ import annotations

import json
import os

import jax

# measured default: NO options — the production vmem_sweep.json says the
# compiler defaults win on the sharded+donated step (module docstring)
MEASURED_TPU_OPTS: dict = {}


def tpu_compile_options():
    env = os.environ.get("CONVNETS_TPU_COMPILER_OPTS")
    if env is not None:
        env = env.strip()
        if env in ("", "0", "off"):
            return None
        return json.loads(env) or None
    return dict(MEASURED_TPU_OPTS) or None


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class _AotOptionsWrapper:
    """Calls a jitted function through per-shape AOT executables compiled
    with the given options. Transparent fallback to the plain jitted call
    if lowering/compiling with options fails (e.g. an option the server
    rejects); donation semantics are the jit's own."""

    def __init__(self, jitted, options):
        self._jitted = jitted
        self._options = options
        self._exes = {}
        self._broken = False

    def _key(self, args):
        return tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
            for a in jax.tree.leaves(args))

    def __call__(self, *args):
        if self._broken:
            return self._jitted(*args)
        key = self._key(args)
        exe = self._exes.get(key)
        if exe is None:
            try:
                exe = self._jitted.lower(*args).compile(
                    compiler_options=self._options)
            except Exception:
                self._broken = True
                return self._jitted(*args)
            self._exes[key] = exe
        return exe(*args)


def jit_with_options(jitted):
    """Wrap an already-jitted function so it compiles with the measured
    TPU options (identity off-TPU or when options are disabled)."""
    opts = tpu_compile_options()
    if opts is None or not _on_tpu():
        return jitted
    return _AotOptionsWrapper(jitted, opts)
