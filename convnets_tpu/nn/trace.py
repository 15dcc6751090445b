"""Per-layer activation tracing for debug mode.

The reference's debug flag prints every layer's computed output shape as
the builder walks the net (basemodel.py:766-779) and per-batch tensor
flags during scoring (basemodel.py:124-126). TPU analogue: temporarily
wrap every module's ``apply`` so a forward pass reports each module's
path, output shape, dtype and activation statistics. Works eagerly and
under jit (the value readout goes through ``jax.debug.callback``);
installation is scoped by the context manager so wrapped applies never
leak into cached jitted step functions.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from convnets_tpu.nn.module import Module


def _emit(printer, path, shape, dtype, mean, std):
    printer(f"[trace] {path:<44} out={shape!s:<22} {dtype:<9} "
            f"mean={float(mean):+.4e} std={float(std):.4e}")


@contextlib.contextmanager
def activation_trace(root: Module, printer=print):
    """Scope in which every module under ``root`` prints its output stats.

    Wraps each module instance's ``apply`` (composites invoke children via
    ``child.apply(...)``, so instance-attribute wrapping captures the full
    tree). Shared submodules are wrapped once, under their first path.
    """
    installed = []  # (module, had_instance_apply, old_value)
    seen = set()

    def wrap(mod: Module, path: str):
        if id(mod) in seen:
            return
        seen.add(id(mod))
        had = "apply" in mod.__dict__
        old = mod.__dict__.get("apply")
        orig = mod.apply

        def traced(variables, x, *, train=False, rng=None,
                   _orig=orig, _path=path):
            out = _orig(variables, x, train=train, rng=rng)
            y = out[0] if isinstance(out, tuple) else out
            if hasattr(y, "shape") and hasattr(y, "dtype"):
                shape = tuple(int(d) for d in y.shape)
                dtype = str(y.dtype)
                yf = y.astype(jnp.float32)
                jax.debug.callback(
                    lambda m, s, p=_path, sh=shape, dt=dtype: _emit(
                        printer, p, sh, dt, m, s),
                    jnp.mean(yf), jnp.std(yf))
            return out

        mod.apply = traced
        installed.append((mod, had, old))
        for name, child in mod.children().items():
            wrap(child, f"{path}/{name}")

    wrap(root, root.__class__.__name__)
    try:
        yield root
    finally:
        for mod, had, old in installed:
            if had:
                mod.apply = old
            else:
                del mod.__dict__["apply"]
