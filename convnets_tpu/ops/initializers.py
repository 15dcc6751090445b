"""Parameter initializers matching the reference's init_params
(reference basemodel.py:85-108):

  conv weight  — He normal, mode='fan_out', nonlinearity='relu'
                 (std = sqrt(2 / fan_out), fan_out = O * kh * kw)
  conv bias    — 0
  BN scale / bias — 1 / 0
  linear weight — N(0, 0.01); linear bias — 0

Weights are HWIO (conv) / (in, out) (linear); fan computations follow
torch._calculate_fan_in_and_fan_out on the equivalent OIHW/(out,in) tensors
so parameter statistics match the reference exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def he_normal_conv(key, shape, dtype=jnp.float32):
    """shape = (kh, kw, I, O); fan_out = O * kh * kw (torch fan_out mode)."""
    kh, kw, _, o = shape
    fan_out = o * kh * kw
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def he_uniform_conv_default(key, shape, dtype=jnp.float32):
    """torch Conv2d *constructor* default (kaiming_uniform a=sqrt(5)) —
    used when Settings.init_params is False, matching the reference leaving
    torch defaults in place. std U(-b, b), b = sqrt(6/((1+5)*fan_in))·...
    torch: bound = sqrt(6 / ((1 + a^2) * fan_in)) with a=sqrt(5) → sqrt(1/fan_in)."""
    kh, kw, i, _ = shape
    fan_in = i * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_default(key, shape, fan_in, dtype=jnp.float32):
    """torch default conv/linear bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_linear(key, shape, dtype=jnp.float32, std=0.01):
    """shape = (in, out); N(0, 0.01) per the reference FC init."""
    return std * jax.random.normal(key, shape, dtype)


def linear_default(key, shape, dtype=jnp.float32):
    """torch Linear constructor default: kaiming_uniform(a=sqrt(5)) on (out, in)."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def zeros(_key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(_key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
