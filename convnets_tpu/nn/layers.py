"""Leaf layers and combinators.

Covers the reference's builder DSL surface (reference basemodel.py:966-1067):
conv2d / conv2d_depthwise / conv2d_block (conv+BN+ReLU, bias off iff BN on),
maxpool2d / avgpool2d / adapt_avgpool2d, plus Linear/Dropout/Flatten and the
graph combinators (Sequential, Concat, Add) that the multi-branch nets
(Inception, Fire, Dense, Shuffle, SE, SK) are built from.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from convnets_tpu import ops
from convnets_tpu.core import shapes
from convnets_tpu.nn.module import Module, split_key
from convnets_tpu.ops import initializers as init


class Conv2d(Module):
    """2-D convolution. Weight (kh, kw, Cin/groups, Cout) HWIO.

    init_mode: 'he' → reference init_params (He fan_out + zero bias,
    basemodel.py:91-94); 'default' → torch constructor defaults.
    """

    def __init__(self, out_channels, kernel, stride=1, padding=0, dilation=1,
                 groups=1, bias=True, init_mode="he"):
        super().__init__()
        self.out_channels = int(out_channels)
        self.kernel = shapes.to_pair(kernel)
        self.stride = shapes.to_pair(stride)
        self.padding = shapes.to_pair(padding)
        self.dilation = shapes.to_pair(dilation)
        self.groups = int(groups)
        self.use_bias = bool(bias)
        self.init_mode = init_mode

    def init(self, key, in_shape):
        cin = in_shape[-1]
        assert cin % self.groups == 0, f"C={cin} not divisible by groups={self.groups}"
        kh, kw = self.kernel
        wshape = (kh, kw, cin // self.groups, self.out_channels)
        kw_, kb_ = jax.random.split(key)
        dtype = self.policy.param_dtype
        if self.init_mode == "he":
            w = init.he_normal_conv(kw_, wshape, dtype)
            b = init.zeros(kb_, (self.out_channels,), dtype) if self.use_bias else None
        else:
            w = init.he_uniform_conv_default(kw_, wshape, dtype)
            fan_in = (cin // self.groups) * kh * kw
            b = (
                init.conv_bias_default(kb_, (self.out_channels,), fan_in, dtype)
                if self.use_bias else None
            )
        params = {"w": w}
        if b is not None:
            params["b"] = b
        return {"params": params, "state": {}}

    def out_shape(self, in_shape):
        return shapes.conv2d_out_shape(
            in_shape, self.out_channels, self.kernel, self.stride, self.padding, self.dilation
        )

    def apply(self, variables, x, *, train=False, rng=None):
        from convnets_tpu.ops import pallas

        p = variables["params"]
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        b = p.get("b")
        w = p["w"].astype(cd)
        if pallas.enabled():
            # route through the Mosaic kernel library when the call fits an
            # implemented envelope (dense or depthwise); fall through to the
            # lax path otherwise. mode "auto" additionally consults the
            # measured per-shape A/B table (ops/pallas/routing.py)
            if (pallas.fits_conv(self.stride, self.dilation, self.groups)
                    and pallas.route_conv(x.shape[1], x.shape[-1],
                                          self.out_channels, self.kernel[0],
                                          self.stride, train)):
                y = pallas.conv2d_train(x, w, self.stride, self.padding)
                if b is not None:
                    y = y + b.astype(y.dtype)
                return y, {}
            if pallas.route_aux() and pallas.fits_depthwise(
                    x.shape[-1], self.out_channels,
                    self.dilation, self.groups):
                y = pallas.depthwise_train(x, w, self.stride, self.padding)
                if b is not None:
                    y = y + b.astype(y.dtype)
                return y, {}
            if pallas.route_aux() and pallas.fits_grouped(
                    x.shape[-1], self.out_channels,
                    self.stride, self.dilation, self.groups):
                y = pallas.grouped_conv2d_train(x, w, self.groups,
                                                self.stride, self.padding)
                if b is not None:
                    y = y + b.astype(y.dtype)
                return y, {}
        if (self.stride == (2, 2) and x.shape[-1] <= 4 and self.groups == 1
                and self.dilation == (1, 1)
                and os.environ.get("CONVNETS_TPU_S2D", "1") == "1"):
            # stem conv (e.g. ResNet 7×7/2 on RGB): Cin=3 wastes 125 of the
            # MXU's 128 contraction lanes. Rewrite as a stride-1 conv over
            # the 2×2 space-to-depth transform — K grows 4×(Cin→4·Cin),
            # numerics identical (the MLPerf ResNet space-to-depth trick).
            from convnets_tpu.ops.pallas.conv import _stride2_as_stride1

            n, ih, iw, _ = x.shape
            kh, kw = self.kernel
            ph, pw = self.padding
            oh = (ih + 2 * ph - kh) // 2 + 1
            ow = (iw + 2 * pw - kw) // 2 + 1
            xs, ws = _stride2_as_stride1(x, w, ph, pw, oh, ow)
            y = ops.conv2d(
                xs, ws, None if b is None else b.astype(cd),
                stride=1, padding=0, accum_dtype=self.policy.accum_dtype,
            )
            return y, {}
        if self.kernel == (3, 3):
            from convnets_tpu.ops import winograd

            if winograd.fits(self.kernel, self.stride, self.dilation,
                             self.groups):
                m = winograd.route(x.shape[1], x.shape[-1],
                                   self.out_channels)
                if m is not None:
                    f = winograd.conv2d_winograd
                    if os.environ.get("CONVNETS_TPU_WINOGRAD_REMAT",
                                      "1") == "1":
                        # without remat autodiff stores the Winograd-domain
                        # V/M tensors (2.25-4x the activation, measured TPU
                        # worker OOM-crash on RN50@224 b256 with m=2) —
                        # recompute the transforms in backward instead
                        import functools

                        f = jax.checkpoint(
                            functools.partial(f, padding=self.padding, m=m))
                        y = f(x, w, None if b is None else b.astype(cd))
                    else:
                        y = f(x, w, None if b is None else b.astype(cd),
                              padding=self.padding, m=m)
                    return y, {}
        y = ops.conv2d(
            x, w, None if b is None else b.astype(cd),
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups, accum_dtype=self.policy.accum_dtype,
        )
        return y, {}

    def __repr__(self):
        return (f"Conv2d({self.out_channels}, k={self.kernel}, s={self.stride}, "
                f"p={self.padding}, d={self.dilation}, g={self.groups})")


class BatchNorm2d(Module):
    """torch-parity batch norm (eps 1e-5, momentum 0.1, unbiased running var)."""

    def __init__(self, eps=1e-5, momentum=0.1):
        super().__init__()
        self.eps = eps
        self.momentum = momentum

    def init(self, key, in_shape):
        c = in_shape[-1]
        dtype = self.policy.param_dtype
        return {
            "params": {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
            "state": {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
        }

    def apply(self, variables, x, *, train=False, rng=None):
        p, s = variables["params"], variables["state"]
        if train:
            y, new_mean, new_var = ops.batch_norm_train(
                x, s["mean"], s["var"], p["scale"], p["bias"],
                eps=self.eps, momentum=self.momentum,
            )
            return y, {"mean": new_mean, "var": new_var}
        y = ops.batch_norm_inference(x, s["mean"], s["var"], p["scale"], p["bias"], eps=self.eps)
        return y, {}

    def __repr__(self):
        return "BatchNorm2d()"


class Linear(Module):
    """Dense layer; weight (in, out). init_mode 'normal' = reference N(0,0.01)."""

    def __init__(self, out_features, bias=True, init_mode="normal"):
        super().__init__()
        self.out_features = int(out_features)
        self.use_bias = bool(bias)
        self.init_mode = init_mode

    def init(self, key, in_shape):
        fan_in = in_shape[-1]
        kw_, kb_ = jax.random.split(key)
        dtype = self.policy.param_dtype
        if self.init_mode == "normal":
            w = init.normal_linear(kw_, (fan_in, self.out_features), dtype)
            b = jnp.zeros((self.out_features,), dtype)
        else:
            w = init.linear_default(kw_, (fan_in, self.out_features), dtype)
            b = init.conv_bias_default(kb_, (self.out_features,), fan_in, dtype)
        params = {"w": w}
        if self.use_bias:
            params["b"] = b
        return {"params": params, "state": {}}

    def out_shape(self, in_shape):
        return (*in_shape[:-1], self.out_features)

    def apply(self, variables, x, *, train=False, rng=None):
        p = variables["params"]
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        b = p.get("b")
        return ops.linear(x, p["w"].astype(cd), None if b is None else b.astype(cd),
                          accum_dtype=self.policy.accum_dtype), {}

    def __repr__(self):
        return f"Linear({self.out_features})"


class ReLU(Module):
    def apply(self, variables, x, *, train=False, rng=None):
        return ops.relu(x), {}


class Sigmoid(Module):
    def apply(self, variables, x, *, train=False, rng=None):
        return ops.sigmoid(x), {}


class Dropout(Module):
    def __init__(self, rate):
        super().__init__()
        self.rate = float(rate)

    def apply(self, variables, x, *, train=False, rng=None):
        if train and self.rate > 0.0 and rng is None:
            raise ValueError("Dropout needs an rng key at train time")
        y = ops.dropout(x, self.rate, rng, train=train)
        return y, {}

    def __repr__(self):
        return f"Dropout({self.rate})"


class MaxPool2d(Module):
    def __init__(self, kernel, stride=None, padding=0):
        super().__init__()
        self.kernel, self.stride, self.padding = kernel, stride, padding

    def out_shape(self, in_shape):
        return shapes.pool2d_out_shape(in_shape, self.kernel, self.stride, self.padding)

    def apply(self, variables, x, *, train=False, rng=None):
        from convnets_tpu.ops import pallas

        if pallas.enabled() and pallas.route_aux():
            if train:
                # Pallas forward + XLA max-routing backward (custom VJP)
                return pallas.pool2d_train(x, "max", self.kernel, self.stride,
                                           self.padding), {}
            return pallas.max_pool2d(x, self.kernel, self.stride, self.padding), {}
        return ops.max_pool2d(x, self.kernel, self.stride, self.padding), {}

    def __repr__(self):
        return f"MaxPool2d(k={self.kernel}, s={self.stride}, p={self.padding})"


class AvgPool2d(Module):
    def __init__(self, kernel, stride=None, padding=0):
        super().__init__()
        self.kernel, self.stride, self.padding = kernel, stride, padding

    def out_shape(self, in_shape):
        return shapes.pool2d_out_shape(in_shape, self.kernel, self.stride, self.padding)

    def apply(self, variables, x, *, train=False, rng=None):
        from convnets_tpu.ops import pallas

        if pallas.enabled() and pallas.route_aux():
            if train:
                return pallas.pool2d_train(x, "avg", self.kernel, self.stride,
                                           self.padding), {}
            return pallas.avg_pool2d(x, self.kernel, self.stride, self.padding), {}
        return ops.avg_pool2d(x, self.kernel, self.stride, self.padding), {}

    def __repr__(self):
        return f"AvgPool2d(k={self.kernel}, s={self.stride}, p={self.padding})"


class GlobalAvgPool2d(Module):
    """adapt_avgpool2d-to-(1,1) equivalent (reference basemodel.py:1035)."""

    def __init__(self, keepdims=False):
        super().__init__()
        self.keepdims = keepdims

    def out_shape(self, in_shape):
        *lead, h, w, c = in_shape
        return (*lead, 1, 1, c) if self.keepdims else (*lead, c)

    def apply(self, variables, x, *, train=False, rng=None):
        y = ops.global_avg_pool2d(x, keepdims=self.keepdims)
        return y, {}


class Flatten(Module):
    def out_shape(self, in_shape):
        return (in_shape[0], shapes.num_flat_features(in_shape))

    def apply(self, variables, x, *, train=False, rng=None):
        return ops.flatten(x), {}


class ChannelShuffle(Module):
    def __init__(self, groups):
        super().__init__()
        self.groups = int(groups)

    def apply(self, variables, x, *, train=False, rng=None):
        return ops.channel_shuffle(x, self.groups), {}

    def __repr__(self):
        return f"ChannelShuffle(g={self.groups})"


class Identity(Module):
    def apply(self, variables, x, *, train=False, rng=None):
        return x, {}


class Lambda(Module):
    """Pure elementwise/shape op: fn(x); shape_fn defaults to identity."""

    def __init__(self, fn: Callable, shape_fn: Optional[Callable] = None, name="Lambda"):
        super().__init__()
        self.fn = fn
        self.shape_fn = shape_fn
        self._name = name

    def out_shape(self, in_shape):
        return tuple(in_shape) if self.shape_fn is None else tuple(self.shape_fn(in_shape))

    def apply(self, variables, x, *, train=False, rng=None):
        return self.fn(x), {}

    def __repr__(self):
        return self._name


def _named(mods) -> Dict[str, Module]:
    if isinstance(mods, dict):
        return dict(mods)
    return {str(i): m for i, m in enumerate(mods)}


class Sequential(Module):
    """Ordered composition; child variables keyed '0', '1', … or by name."""

    def __init__(self, layers: Sequence[Module] | Dict[str, Module]):
        super().__init__()
        self.layers = _named(layers)

    def children(self):
        return self.layers

    def init(self, key, in_shape):
        params, state = {}, {}
        shape = tuple(in_shape)
        for i, (name, layer) in enumerate(self.layers.items()):
            v = layer.init(split_key(key, i), shape)
            if v["params"]:
                params[name] = v["params"]
            if v["state"]:
                state[name] = v["state"]
            shape = layer.out_shape(shape)
        return {"params": params, "state": state}

    def out_shape(self, in_shape):
        shape = tuple(in_shape)
        for layer in self.layers.values():
            shape = layer.out_shape(shape)
        return shape

    def apply(self, variables, x, *, train=False, rng=None):
        params, state = variables["params"], variables["state"]
        new_state = {}
        for i, (name, layer) in enumerate(self.layers.items()):
            v = {"params": params.get(name, {}), "state": state.get(name, {})}
            x, ns = layer.apply(v, x, train=train, rng=split_key(rng, i))
            if ns:
                new_state[name] = ns
        return x, new_state

    def __repr__(self):
        return f"Sequential[{len(self.layers)}]"


class Remat(Module):
    """Rematerialization wrapper: the child's forward activations are NOT
    saved for backward — they are recomputed from the block input during
    the backward pass (jax.checkpoint). Trades FLOPs for HBM: the standard
    TPU lever for activation-memory pressure (SURVEY.md §7, DenseNet's
    concat-heavy graphs; also useful to fit larger batches)."""

    def __init__(self, child: Module):
        super().__init__()
        self.child = child

    def children(self):
        return {"child": self.child}

    def init(self, key, in_shape):
        return self.child.init(key, in_shape)

    def out_shape(self, in_shape):
        return self.child.out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        if not train:
            return self.child.apply(variables, x, train=False, rng=rng)

        @jax.checkpoint
        def run(params, state, x, rng):
            return self.child.apply({"params": params, "state": state},
                                    x, train=True, rng=rng)

        return run(variables["params"], variables["state"], x, rng)

    def __repr__(self):
        return f"Remat({self.child!r})"


class _MultiBranch(Module):
    """Shared machinery for branch combinators (Concat / Add)."""

    def __init__(self, branches: Sequence[Module] | Dict[str, Module]):
        super().__init__()
        self.branches = _named(branches)

    def children(self):
        return self.branches

    def shape_flow(self, in_shape):
        return {name: tuple(in_shape) for name in self.branches}

    def init(self, key, in_shape):
        params, state = {}, {}
        for i, (name, br) in enumerate(self.branches.items()):
            v = br.init(split_key(key, i), in_shape)
            if v["params"]:
                params[name] = v["params"]
            if v["state"]:
                state[name] = v["state"]
        return {"params": params, "state": state}

    def _apply_branches(self, variables, x, train, rng):
        params, state = variables["params"], variables["state"]
        outs, new_state = [], {}
        for i, (name, br) in enumerate(self.branches.items()):
            v = {"params": params.get(name, {}), "state": state.get(name, {})}
            y, ns = br.apply(v, x, train=train, rng=split_key(rng, i))
            outs.append(y)
            if ns:
                new_state[name] = ns
        return outs, new_state


class Concat(_MultiBranch):
    """Parallel branches concatenated on channels (Inception/Fire/Dense/Shuffle)."""

    def out_shape(self, in_shape):
        outs = [br.out_shape(in_shape) for br in self.branches.values()]
        c = sum(o[-1] for o in outs)
        return (*outs[0][:-1], c)

    def apply(self, variables, x, *, train=False, rng=None):
        outs, new_state = self._apply_branches(variables, x, train, rng)
        return jnp.concatenate(outs, axis=-1), new_state

    def __repr__(self):
        return f"Concat[{len(self.branches)}]"


class Add(_MultiBranch):
    """Parallel branches summed (residual connections); optional post-ReLU."""

    def __init__(self, branches, post_relu=False):
        super().__init__(branches)
        self.post_relu = post_relu

    def out_shape(self, in_shape):
        return self.branches[next(iter(self.branches))].out_shape(in_shape)

    def apply(self, variables, x, *, train=False, rng=None):
        outs, new_state = self._apply_branches(variables, x, train, rng)
        y = outs[0]
        for o in outs[1:]:
            y = y + o
        if self.post_relu:
            y = ops.relu(y)
        return y, new_state

    def __repr__(self):
        return f"Add[{len(self.branches)}]{'+ReLU' if self.post_relu else ''}"


class ConvBNReLU(Sequential):
    """conv → BN → [ReLU] with the train-mode statistics pass fused into
    the conv kernel (ops/pallas/fused.py) and inference BN folded into the
    conv epilogue (ops/pallas/conv.py conv2d_fused) — the cuDNN fusion the
    reference's conv2d_block relies on (reference basemodel.py:999-1015).

    Child layout stays exactly Sequential['0' Conv2d, '1' BatchNorm2d,
    ('2' ReLU)], so parameter/state trees, init, shapes, and checkpoints
    are identical to the unfused composition; apply() reroutes to the
    fused kernels when the Pallas path is enabled and the conv fits the
    envelope, and falls back to Sequential.apply otherwise.
    """

    def __init__(self, conv: Conv2d, bn: BatchNorm2d, act: bool):
        layers: List[Module] = [conv, bn]
        if act:
            layers.append(ReLU())
        super().__init__(layers)
        self._conv, self._bn, self._act = conv, bn, act

    def _fits(self, cin: int) -> bool:
        from convnets_tpu.ops import pallas

        c = self._conv
        if c.use_bias:
            return False
        return (pallas.fits_conv(c.stride, c.dilation, c.groups)
                or pallas.fits_grouped(cin, c.out_channels, c.stride,
                                       c.dilation, c.groups))

    def apply(self, variables, x, *, train=False, rng=None):
        from convnets_tpu.ops import pallas

        if not (pallas.enabled() and self._fits(x.shape[-1])
                and pallas.route_conv(x.shape[1], x.shape[-1],
                                      self._conv.out_channels,
                                      self._conv.kernel[0],
                                      self._conv.stride, train)):
            return super().apply(variables, x, train=train, rng=rng)
        if train and pallas.spmd_active():
            # the fused train kernel's batch statistics are per-shard under
            # shard_map, which would break the sync-BN numerics the GSPMD
            # lax path guarantees — unfused composition instead (its Conv2d
            # child still rides the Pallas kernel via spmd_call; BN's
            # global-batch reductions stay in GSPMD where they are synced)
            return super().apply(variables, x, train=train, rng=rng)

        c, bn = self._conv, self._bn
        params, state = variables["params"], variables["state"]
        cd = c.policy.compute_dtype
        x = x.astype(cd)
        w = params["0"]["w"].astype(cd)
        scale, bias = params["1"]["scale"], params["1"]["bias"]
        rm, rv = state["1"]["mean"], state["1"]["var"]

        if train:
            out, mean, var = pallas.conv_bn_relu_train(
                x, w, scale, bias, c.stride, c.padding, c.groups,
                bn.eps, self._act)
            n = out.shape[0] * out.shape[1] * out.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = bn.momentum
            new_mean = (1.0 - m) * rm.astype(jnp.float32) + m * mean
            new_var = (1.0 - m) * rv.astype(jnp.float32) + m * unbiased
            return out, {"1": {"mean": new_mean, "var": new_var}}

        # inference: fold BN into the conv epilogue (y·scale' + shift')
        inv = jax.lax.rsqrt(rv.astype(jnp.float32) + bn.eps)
        s = scale.astype(jnp.float32) * inv
        sh = bias.astype(jnp.float32) - rm.astype(jnp.float32) * s
        wd = w if c.groups == 1 else pallas.block_diag_weight(w, c.groups)
        out = pallas.conv2d_fused(x, wd.astype(cd), s, sh,
                                  stride=c.stride, padding=c.padding,
                                  relu=self._act)
        return out, {}

    def __repr__(self):
        return f"ConvBNReLU({self._conv!r}){'+ReLU' if self._act else ''}"


def conv_block(out_channels, kernel, stride=1, padding=0, dilation=1, groups=1,
               batch_norm=True, act=True, init_mode="he") -> Sequential:
    """conv → [BN] → [ReLU] with bias off iff BN on — the reference's
    conv2d_block / Conv2dBlock (basemodel.py:999-1015, :1045-1067)."""
    conv = Conv2d(out_channels, kernel, stride=stride, padding=padding,
                  dilation=dilation, groups=groups, bias=not batch_norm,
                  init_mode=init_mode)
    if batch_norm:
        return ConvBNReLU(conv, BatchNorm2d(), act)
    layers: List[Module] = [conv]
    if act:
        layers.append(ReLU())
    return Sequential(layers)
