"""Functional module system.

Design (TPU-first, replaces the reference's stateful nn.Module hierarchy):

* A ``Module`` is a *stateless description* of a layer — hyper-parameters
  only, no arrays. Safe to close over inside ``jax.jit``.
* Parameters and mutable state (BN running stats) live in external pytrees:
  ``variables = {"params": ..., "state": ...}``, mirroring the module tree
  with string keys, so checkpoints are plain name→array maps.
* ``init(key, in_shape)`` builds variables analytically — shape inference is
  pure (core/shapes.py) rather than the reference's mutate-as-you-declare
  scheme (reference basemodel.py:725-816).
* ``apply(variables, x, train=..., rng=...)`` is a pure function returning
  ``(y, new_state)``; the jitted train step threads new_state through.

Dtype policy is captured at construction time from a context variable
(``use_policy``), replacing AMP autocast with explicit bf16 compute.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Sequence, Tuple

import jax
import numpy as np

from convnets_tpu.core.precision import Policy, DEFAULT_POLICY

_POLICY_STACK = [DEFAULT_POLICY]


@contextlib.contextmanager
def use_policy(policy: Policy):
    """Layers constructed inside this context compute in policy.compute_dtype."""
    _POLICY_STACK.append(policy)
    try:
        yield policy
    finally:
        _POLICY_STACK.pop()


def current_policy() -> Policy:
    return _POLICY_STACK[-1]


class Module:
    """Base class: a pure-function layer description."""

    def __init__(self):
        self.policy = current_policy()

    # -- required interface ---------------------------------------------

    def init(self, key: jax.Array, in_shape: Sequence[int]) -> dict:
        """Return {'params': pytree, 'state': pytree} for input shape (N?, H, W, C)."""
        del key, in_shape
        return {"params": {}, "state": {}}

    def out_shape(self, in_shape: Sequence[int]) -> Tuple[int, ...]:
        return tuple(in_shape)

    def apply(self, variables: dict, x, *, train: bool = False, rng=None):
        """Return (y, new_state)."""
        raise NotImplementedError

    # -- conveniences ----------------------------------------------------

    def children(self) -> Dict[str, "Module"]:
        return {}

    def __call__(self, variables, x, *, train=False, rng=None):
        return self.apply(variables, x, train=train, rng=rng)

    def __repr__(self):
        return self.__class__.__name__


def split_key(key, index: int):
    """Deterministic per-child key derivation."""
    return None if key is None else jax.random.fold_in(key, index)


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def count_state(state) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(state)))


def summarize(module: Module, in_shape, variables=None, key=None) -> str:
    """Layer-by-layer summary: name, output shape, parameter count —
    the print_summary equivalent (reference basemodel.py:950-963)."""
    if variables is None:
        key = key if key is not None else jax.random.key(0)
        variables = module.init(key, in_shape)
    lines = []
    total = [0, 0]

    def walk(mod, params, state, shape, prefix):
        kids = mod.children()
        out = mod.out_shape(shape)
        own_p = count_params(params) if not kids else 0
        own_s = count_state(state) if not kids else 0
        lines.append(
            f"{prefix}{mod!r:<30} out={tuple(int(d) for d in out)!s:<22}"
            f" params={own_p:,}" + (f" state={own_s:,}" if own_s else "")
        )
        total[0] += own_p
        total[1] += own_s
        if kids:
            walk_children(mod, kids, params, state, shape, prefix + "  ")
        return out

    def walk_children(mod, kids, params, state, shape, prefix):
        # Containers define how shapes flow through children.
        if hasattr(mod, "shape_flow"):
            flows = mod.shape_flow(shape)
        else:
            flows = {}
            s = shape
            for name in kids:
                flows[name] = s
                s = kids[name].out_shape(s)
        for name, child in kids.items():
            walk(child, params.get(name, {}), state.get(name, {}), flows[name], prefix)

    walk(module, variables["params"], variables["state"], tuple(in_shape), "")
    lines.append(f"total params: {total[0]:,}   total state: {total[1]:,}")
    return "\n".join(lines)
