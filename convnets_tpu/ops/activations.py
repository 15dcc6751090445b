"""Elementwise activations and tensor reshaping ops.

Covers the reference's activation surface: ReLU everywhere, sigmoid in the
SE unit (senet.py:216-255), softmax over SK paths (sknet.py:173-242), plus
channel shuffle (shufflenet_v1.py:173-190), flatten, dropout.
All are VPU-friendly and fused by XLA into neighbouring ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, jnp.zeros((), x.dtype))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


def flatten(x):
    """Flatten all non-batch dims (reference nn.Flatten equivalent)."""
    return x.reshape(x.shape[0], -1)


def channel_shuffle(x, groups: int):
    """ShuffleNet channel shuffle, NHWC.

    Reference (NCHW) does view(g, C/g) → transpose → flatten
    (shufflenet_v1.py:173-190); in NHWC the same permutation applies to the
    minor axis: (…, g, C/g) → swap → (…, C).
    """
    *lead, c = x.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


def dropout(x, rate: float, key, *, train: bool):
    """Inverted dropout, torch semantics (scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))
