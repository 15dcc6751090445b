"""Shared attention blocks: Squeeze-and-Excitation and Selective-Kernel.

Parity targets:
  SEUnit  — reference senet.py:216-255 / se_resnet.py:216-255
  SKConv  — reference sknet.py:171-240 / sk_resnet.py:171-240
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnets_tpu import nn, ops
from convnets_tpu.nn.module import Module, split_key
from convnets_tpu.ops import initializers as init


class SEUnit(Module):
    """Squeeze-and-Excitation: gap → FC(C→C/r, no bias) → ReLU → FC → sigmoid
    → channel rescale. Keeps tensor shape."""

    def __init__(self, channels: int, reduction: int, linear_init="normal"):
        super().__init__()
        self.channels = int(channels)
        self.reduced = int(channels) // int(reduction)
        self.linear_init = linear_init

    def init(self, key, in_shape):
        k1, k2 = jax.random.split(key)
        dtype = self.policy.param_dtype
        if self.linear_init == "normal":
            w1 = init.normal_linear(k1, (self.channels, self.reduced), dtype)
            w2 = init.normal_linear(k2, (self.reduced, self.channels), dtype)
        else:
            w1 = init.linear_default(k1, (self.channels, self.reduced), dtype)
            w2 = init.linear_default(k2, (self.reduced, self.channels), dtype)
        return {"params": {"w1": w1, "w2": w2}, "state": {}}

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        squeezed = ops.global_avg_pool2d(x)  # (B, C)
        e = ops.linear(squeezed, p["w1"], accum_dtype=self.policy.accum_dtype)
        e = ops.relu(e)
        e = ops.linear(e, p["w2"], accum_dtype=self.policy.accum_dtype)
        e = ops.sigmoid(e)
        return x * e[:, None, None, :].astype(x.dtype), {}

    def __repr__(self):
        return f"SEUnit(C={self.channels}, r→{self.reduced})"


class SKConv(Module):
    """Selective-Kernel convolution.

    num_paths dilated grouped 3x3 conv blocks (dilation 1+i, padding 1+i),
    fuse = elementwise sum → gap → 1x1 descriptor block (≥ min_descriptor
    channels), per-path 1x1 attention conv, softmax across paths, weighted
    sum of the path feature maps. Shape-preserving except for stride.
    """

    def __init__(self, builder, num_paths=2, groups=32, reduction=16,
                 min_descriptor=32, stride=1):
        super().__init__()
        self.num_paths = num_paths
        self.channels = builder.in_channels
        self.stride = stride
        desc = max(self.channels // reduction, min_descriptor)
        self.desc_size = desc

        self.kernels = {
            f"kernel{i}": builder.conv_block(
                self.channels, set_output=False, kernel=3,
                padding=1 + i, dilation=1 + i, groups=groups, stride=stride,
            )
            for i in range(num_paths)
        }
        self.descriptor = builder.conv_block(desc, set_output=False, kernel=1)
        # attention convs are raw torch nn.Conv2d in the reference → bias on
        self.attentions = {
            f"att{i}": nn.Conv2d(self.channels, 1, bias=True, init_mode=builder.conv_init)
            for i in range(num_paths)
        }

    def children(self):
        return {**self.kernels, "descriptor": self.descriptor, **self.attentions}

    def shape_flow(self, in_shape):
        kshape = tuple(in_shape)
        out = next(iter(self.kernels.values())).out_shape(kshape)
        gap = (out[0], 1, 1, self.channels)
        desc = (out[0], 1, 1, self.desc_size)
        flows = {name: kshape for name in self.kernels}
        flows["descriptor"] = gap
        flows.update({name: desc for name in self.attentions})
        return flows

    def init(self, key, in_shape):
        params, state = {}, {}
        flows = self.shape_flow(in_shape)
        for i, (name, child) in enumerate(self.children().items()):
            v = child.init(split_key(key, i), flows[name])
            if v["params"]:
                params[name] = v["params"]
            if v["state"]:
                state[name] = v["state"]
        return {"params": params, "state": state}

    def out_shape(self, in_shape):
        return next(iter(self.kernels.values())).out_shape(tuple(in_shape))

    def apply(self, variables, x, *, train=False, rng=None):
        params, state = variables["params"], variables["state"]
        new_state = {}

        def run(name, child, inp, i):
            v = {"params": params.get(name, {}), "state": state.get(name, {})}
            y, ns = child.apply(v, inp, train=train, rng=split_key(rng, i))
            if ns:
                new_state[name] = ns
            return y

        feats = [
            run(name, child, x, i) for i, (name, child) in enumerate(self.kernels.items())
        ]
        stacked = jnp.stack(feats, axis=-2)  # (B, H', W', P, C)
        fused = jnp.sum(stacked, axis=-2)
        gap = ops.global_avg_pool2d(fused, keepdims=True)  # (B,1,1,C)
        desc = run("descriptor", self.descriptor, gap, self.num_paths)
        atts = [
            run(name, child, desc, self.num_paths + 1 + i)
            for i, (name, child) in enumerate(self.attentions.items())
        ]
        att = jnp.stack(atts, axis=-2)  # (B,1,1,P,C)
        att = ops.softmax(att.astype(jnp.float32), axis=-2).astype(stacked.dtype)
        out = jnp.sum(stacked * att, axis=-2)
        return out, new_state

    def __repr__(self):
        return f"SKConv(C={self.channels}, paths={self.num_paths}, s={self.stride})"
