"""DenseNet-121/169/201/264/161, reference densenet.py:30-189:
(growth_rate, block_sizes, init_features) config; DenseLayer =
BN→ReLU→Dropout→1x1(4g) then BN→ReLU→Dropout→3x3(g), concat with input;
TransitionBlock = BN→ReLU→1x1(C/2)→avgpool2. Note the pre-activation BNs are
unconditional in the reference (raw nn.BatchNorm2d) while conv bias still
follows `not batch_norm`."""

from __future__ import annotations

import os

import jax.numpy as jnp

from convnets_tpu import nn, ops
from convnets_tpu.models.base import Builder, Model, register
from convnets_tpu.nn.module import Module, split_key

CONFIG = {
    "121": (32, [6, 12, 24, 16], 64),
    "169": (32, [6, 12, 32, 32], 64),
    "201": (32, [6, 12, 48, 32], 64),
    "264": (32, [6, 12, 64, 48], 64),
    "161": (48, [6, 12, 36, 24], 96),
}


class DenseBlockFused(Module):
    """Shared-statistics dense block (r5 DN121 conv-floor probe,
    r4 VERDICT #8).

    In the standard formulation every dense layer's leading BN reduces the
    whole accumulated feature buffer for batch statistics — but the
    buffer is a concat of tensors whose contents never change, so the
    per-channel stats layer i computes over block j are EXACTLY the stats
    layer j+1 already computed. This block computes each source block's
    statistics once (ops.batch_stats), banks them (one running-stat entry
    per source block instead of per (layer, block) pair — identical
    values, since all the duplicate per-layer running stats in the
    standard form see the same updates), and per layer applies only the
    fused normalize+affine+ReLU on the buffer read feeding the 1×1 conv
    (ops.bn_apply_stats — gradient-exact via its total-derivative VJP).
    O(L) full-buffer stat reductions per block instead of O(L²).

    Numerics: equal to the standard block up to float reassociation
    (tests/test_densenet_fused.py). Opt-in via
    CONVNETS_TPU_DENSENET_FUSED=1 (read at build time) — the state-tree
    layout differs from the standard block, so published standard-layout
    checkpoints keep loading by default.
    """

    def __init__(self, size, growth, in_channels, bottleneck_factor=4,
                 drop_rate=0.0, eps=1e-5, momentum=0.1, conv_init="he"):
        super().__init__()
        self.size = int(size)
        self.growth = int(growth)
        self.c0 = int(in_channels)
        self.drop = float(drop_rate)
        self.eps = float(eps)
        self.momentum = float(momentum)
        self._conv1 = [nn.Conv2d(bottleneck_factor * growth, kernel=1,
                                 bias=False, init_mode=conv_init)
                       for _ in range(self.size)]
        self._conv2 = [nn.Conv2d(growth, kernel=3, padding=1, bias=False,
                                 init_mode=conv_init)
                       for _ in range(self.size)]

    def children(self):
        out = {}
        for i in range(self.size):
            out[f"conv1_{i}"] = self._conv1[i]
            out[f"conv2_{i}"] = self._conv2[i]
        return out

    def _bank_width(self, j):
        return self.c0 if j == 0 else self.growth

    def init(self, key, in_shape):
        import jax

        dtype = self.policy.param_dtype
        params, state = {}, {}
        n, h, w, _ = in_shape
        for i in range(self.size):
            cin = self.c0 + i * self.growth
            mid = self._conv1[i].out_channels
            params[f"bn1_{i}"] = {"scale": jnp.ones((cin,), dtype),
                                  "bias": jnp.zeros((cin,), dtype)}
            k1, k2, key = jax.random.split(key, 3)
            params[f"conv1_{i}"] = self._conv1[i].init(
                k1, (n, h, w, cin))["params"]
            params[f"bn2_{i}"] = {"scale": jnp.ones((mid,), dtype),
                                  "bias": jnp.zeros((mid,), dtype)}
            state[f"bn2_{i}"] = {"mean": jnp.zeros((mid,), jnp.float32),
                                 "var": jnp.ones((mid,), jnp.float32)}
            params[f"conv2_{i}"] = self._conv2[i].init(
                k2, (n, h, w, mid))["params"]
        # stats bank: blocks 0..size-1 are consumed inside the block (the
        # last produced block only joins the output concat, whose consumer
        # BN computes its own stats)
        for j in range(self.size):
            c = self._bank_width(j)
            state[f"bank_{j}"] = {"mean": jnp.zeros((c,), jnp.float32),
                                  "var": jnp.ones((c,), jnp.float32)}
        return {"params": params, "state": state}

    def out_shape(self, in_shape):
        n, h, w, c = in_shape
        return (n, h, w, c + self.size * self.growth)

    def apply(self, variables, x, *, train=False, rng=None):
        p, s = variables["params"], variables["state"]
        cd = self.policy.compute_dtype
        x = x.astype(cd)
        new_state = {}

        def bank_stats(t, j):
            rm, rv = s[f"bank_{j}"]["mean"], s[f"bank_{j}"]["var"]
            if not train:
                return (rm.astype(jnp.float32), rv.astype(jnp.float32))
            mean, var = ops.batch_stats(t)
            cnt = t.shape[0] * t.shape[1] * t.shape[2]
            unbiased = var * (cnt / max(cnt - 1, 1))
            mom = self.momentum
            new_state[f"bank_{j}"] = {
                "mean": (1.0 - mom) * rm.astype(jnp.float32) + mom * mean,
                "var": (1.0 - mom) * rv.astype(jnp.float32) + mom * unbiased,
            }
            return mean, var

        blocks = [x]
        m, v = bank_stats(x, 0)
        means, variances = [m], [v]
        for i in range(self.size):
            g1 = p[f"bn1_{i}"]
            h = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, -1)
            mc = jnp.concatenate(means) if len(means) > 1 else means[0]
            vc = jnp.concatenate(variances) if len(variances) > 1 else variances[0]
            if train:
                h = ops.bn_apply_stats(h, mc, vc, g1["scale"], g1["bias"],
                                       self.eps)
            else:
                h = ops.batch_norm_inference(h, mc, vc, g1["scale"],
                                             g1["bias"], eps=self.eps)
            h = ops.relu(h)
            h = ops.dropout(h, self.drop, split_key(rng, 2 * i), train=train)
            h, _ = self._conv1[i].apply(
                {"params": p[f"conv1_{i}"], "state": {}}, h, train=train)
            g2, s2 = p[f"bn2_{i}"], s[f"bn2_{i}"]
            if train:
                h, nm, nv = ops.batch_norm_train(
                    h, s2["mean"], s2["var"], g2["scale"], g2["bias"],
                    eps=self.eps, momentum=self.momentum)
                new_state[f"bn2_{i}"] = {"mean": nm, "var": nv}
            else:
                h = ops.batch_norm_inference(
                    h, s2["mean"], s2["var"], g2["scale"], g2["bias"],
                    eps=self.eps)
            h = ops.relu(h)
            h = ops.dropout(h, self.drop, split_key(rng, 2 * i + 1),
                            train=train)
            xi, _ = self._conv2[i].apply(
                {"params": p[f"conv2_{i}"], "state": {}}, h, train=train)
            blocks.append(xi)
            if i < self.size - 1:
                m, v = bank_stats(xi, i + 1)
                means.append(m)
                variances.append(v)
        return jnp.concatenate(blocks, -1), new_state

    def __repr__(self):
        return f"DenseBlockFused(size={self.size}, growth={self.growth})"


def _dense_layer(b: Builder, growth: int, bottleneck_factor: int) -> nn.Concat:
    body = nn.Sequential([
        nn.BatchNorm2d(),
        nn.ReLU(),
        b.dropout(),
        b.conv(bottleneck_factor * growth, kernel=1),
        nn.BatchNorm2d(),
        nn.ReLU(),
        b.dropout(),
        b.conv(growth, kernel=3, padding=1),
    ])
    # concat([x, body(x)]) — input first (reference densenet.py:138)
    layer = nn.Concat([nn.Identity(), body])
    return layer


def _dense_block(b: Builder, size: int, growth: int):
    if os.environ.get("CONVNETS_TPU_DENSENET_FUSED", "0") == "1":
        block = DenseBlockFused(
            size, growth, b.in_channels, bottleneck_factor=4,
            drop_rate=b.setting.dropout_rate, conv_init=b.conv_init)
        b.in_channels = b.in_channels + size * growth
        if getattr(b.setting, "remat", False):
            block = nn.Remat(block)
        return block
    layers = []
    for _ in range(size):
        cin = b.in_channels
        layers.append(_dense_layer(b, growth, bottleneck_factor=4))
        b.in_channels = cin + growth
    block = nn.Sequential(layers)
    if getattr(b.setting, "remat", False):
        # dense blocks are the framework's worst activation-memory case
        # (SURVEY.md §7 hard part 4: concat-heavy NHWC graphs) — remat
        # them whole so only the block input survives to backward
        block = nn.Remat(block)
    return block


def _transition(b: Builder) -> nn.Sequential:
    half = b.in_channels // 2
    block = nn.Sequential([
        nn.BatchNorm2d(),
        nn.ReLU(),
        b.conv(half, kernel=1),
        nn.AvgPool2d(2, stride=2),
    ])
    b.in_channels = half
    return block


@register("densenet")
def build_densenet(setting) -> Model:
    growth, block_sizes, init_features = CONFIG[str(setting.kind)]
    b = Builder(setting)
    layers = [
        b.conv_block(init_features, kernel=7, stride=2, padding=3),
        nn.MaxPool2d(3, stride=2, padding=1),
    ]
    for i, size in enumerate(block_sizes):
        layers.append(_dense_block(b, size, growth))
        if i != len(block_sizes) - 1:
            layers.append(_transition(b))
    layers += [
        nn.BatchNorm2d(),
        nn.ReLU(),
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(setting.num_classes),
    ]
    return Model("DenseNet", setting, nn.Sequential(layers))
