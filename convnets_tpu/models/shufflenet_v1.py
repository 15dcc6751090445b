"""ShuffleNet-v1 (g1/g2/g3/g4/g8), reference shufflenet_v1.py:28-190.

ShuffleUnit: grouped 1x1 compress (ungrouped for the very first unit) →
channel shuffle → depthwise 3x3 (no act) → grouped 1x1 expand (no act);
stride-2 units concat an avg-pooled identity, stride-1 units add; ReLU after.
"""

from __future__ import annotations

import jax.numpy as jnp

from convnets_tpu import nn, ops
from convnets_tpu.models.base import Builder, Model, register
from convnets_tpu.nn.module import Module, split_key

CONFIG = {
    "g1": [(2, 1, 144), (1, 3, 144), (2, 1, 288), (1, 7, 288), (2, 1, 576), (1, 3, 576)],
    "g2": [(2, 1, 200), (1, 3, 200), (2, 1, 400), (1, 7, 400), (2, 1, 800), (1, 3, 800)],
    "g3": [(2, 1, 240), (1, 3, 240), (2, 1, 480), (1, 7, 480), (2, 1, 960), (1, 3, 960)],
    "g4": [(2, 1, 272), (1, 3, 272), (2, 1, 544), (1, 7, 544), (2, 1, 1088), (1, 3, 1088)],
    "g8": [(2, 1, 384), (1, 3, 384), (2, 1, 768), (1, 7, 768), (2, 1, 1536), (1, 3, 1536)],
}


class ShuffleUnit(Module):
    def __init__(self, b: Builder, out_channels: int, groups: int, stride: int,
                 downsample: bool, first_conv: bool):
        super().__init__()
        self.groups = groups
        self.downsample = downsample
        self.stride = stride
        bottleneck = out_channels // 4
        identity_ch = b.in_channels
        body_out = out_channels - identity_ch if downsample else out_channels

        self.compress = b.conv_block(bottleneck, kernel=1,
                                     groups=1 if first_conv else groups)
        self.depthwise = b.conv_block(bottleneck, activation=False, kernel=3,
                                      stride=stride, padding=1, groups=bottleneck)
        self.expand = b.conv_block(body_out, activation=False, kernel=1, groups=groups)
        b.in_channels = out_channels
        self._out_channels = out_channels

    def children(self):
        return {"compress": self.compress, "depthwise": self.depthwise,
                "expand": self.expand}

    def init(self, key, in_shape):
        params, state = {}, {}
        shape = tuple(in_shape)
        for i, (name, child) in enumerate(self.children().items()):
            v = child.init(split_key(key, i), shape)
            if v["params"]:
                params[name] = v["params"]
            if v["state"]:
                state[name] = v["state"]
            shape = child.out_shape(shape)
        return {"params": params, "state": state}

    def out_shape(self, in_shape):
        n, h, w, _ = in_shape
        if self.downsample:
            h = (h + 2 - 3) // 2 + 1  # avgpool 3x3 s2 p1 / strided depthwise
            w = (w + 2 - 3) // 2 + 1
        return (n, h, w, self._out_channels)

    def apply(self, variables, x, *, train=False, rng=None):
        params, state = variables["params"], variables["state"]
        new_state = {}

        def run(name, child, inp, i):
            v = {"params": params.get(name, {}), "state": state.get(name, {})}
            y, ns = child.apply(v, inp, train=train, rng=split_key(rng, i))
            if ns:
                new_state[name] = ns
            return y

        identity = x
        if self.downsample:
            identity = ops.avg_pool2d(identity, 3, stride=2, padding=1)

        out = run("compress", self.compress, x, 0)
        out = ops.channel_shuffle(out, self.groups)
        out = run("depthwise", self.depthwise, out, 1)
        out = run("expand", self.expand, out, 2)

        if self.downsample:
            out = ops.relu(jnp.concatenate([identity, out], axis=-1))
        else:
            out = ops.relu(out + identity)
        return out, new_state

    def __repr__(self):
        return f"ShuffleUnit(out={self._out_channels}, g={self.groups}, s={self.stride})"


@register("shufflenet_v1")
def build_shufflenet_v1(setting) -> Model:
    cfg = CONFIG[str(setting.kind)]
    groups = int(str(setting.kind)[1:])
    b = Builder(setting)
    layers = [
        b.conv_block(24, kernel=3, stride=2, padding=1),
        nn.MaxPool2d(3, stride=2, padding=1),
    ]
    for i, (stride, repeat, out_channels) in enumerate(cfg):
        for j in range(repeat):
            layers.append(ShuffleUnit(
                b, out_channels, groups, stride,
                downsample=(stride == 2), first_conv=(i == 0 and j == 0),
            ))
    layers += [
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(setting.num_classes),
    ]
    return Model("ShuffleNetV1", setting, nn.Sequential(layers))
