"""Optimizers and gradient clipping — pure pytree transforms.

Matches torch.optim.Adam semantics exactly (the reference's only optimizer,
basemodel.py:63-66): L2 weight decay folded into the gradient *before* the
moment updates (not decoupled AdamW), bias-corrected moments, eps outside
the sqrt. SGD(+momentum) is provided for the LeNet/ImageNet baseline
configs (BASELINE.json). The learning rate is NOT baked into the optimizer
state — it is a dynamic scalar in TrainState so the plateau scheduler can
change it without recompilation.

Gradient clipping matches torch.nn.utils.clip_grad_norm_/clip_grad_value_
(reference basemodel.py:131-178): the norm is computed over all gradients
as one concatenated vector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jax.Array  # int32 scalar
    mu: object        # first moments, same tree as params
    nu: object        # second moments


class SGDState(NamedTuple):
    momentum: object  # velocity tree (or None placeholder of zeros)


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, zeros))


def adam_update(grads, state: AdamState, params, *, lr, weight_decay=0.0,
                b1=0.9, b2=0.999, eps=1e-8):
    """One Adam step. lr may be a traced scalar. Returns (new_params, new_state)."""
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(b1, cf)
    bc2 = 1.0 - jnp.power(b2, cf)

    def leaf(g, m, v, p):
        g = g.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        step = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return (p - step.astype(p.dtype)), m, v

    flat_g, treedef = jax.tree.flatten(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_p = treedef.flatten_up_to(params)
    out = [leaf(g, m, v, p) for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(count=count, mu=new_m, nu=new_v)


def sgd_init(params) -> SGDState:
    return SGDState(momentum=jax.tree.map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params))


def sgd_update(grads, state: SGDState, params, *, lr, weight_decay=0.0,
               momentum=0.0, nesterov=False):
    """torch.optim.SGD semantics (v = m·v + g; p -= lr·v)."""

    def leaf(g, v, p):
        g = g.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p.astype(jnp.float32)
        v = momentum * v + g
        d = g + momentum * v if nesterov else v
        return (p - (lr * d).astype(p.dtype)), v

    flat_g, treedef = jax.tree.flatten(grads)
    flat_v = treedef.flatten_up_to(state.momentum)
    flat_p = treedef.flatten_up_to(params)
    out = [leaf(g, v, p) for g, v, p in zip(flat_g, flat_v, flat_p)]
    return (
        treedef.unflatten([o[0] for o in out]),
        SGDState(momentum=treedef.unflatten([o[1] for o in out])),
    )


def global_norm(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def clip_by_global_norm(grads, max_norm: float):
    """torch clip_grad_norm_: scale all grads by max_norm/total_norm if needed."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads)


def clip_by_value(grads, clip_value: float):
    return jax.tree.map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)
