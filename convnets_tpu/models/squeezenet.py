"""SqueezeNet 1.0 / 1.1, reference squeezenet.py:28-153:
op-list config of conv/maxpool/fire; Fire = squeeze 1x1 → parallel expand
1x1 + 3x3 concat; fully-convolutional classifier (dropout → 1x1 conv block
with num_classes filters → global avgpool → flatten)."""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register

CONFIG = {
    "1.0": [
        ("conv", 96, 7, 2),
        ("maxpool", 3, 2),
        ("fire", 16, 64, 64),
        ("fire", 16, 64, 64),
        ("fire", 32, 128, 128),
        ("maxpool", 3, 2),
        ("fire", 32, 128, 128),
        ("fire", 48, 192, 192),
        ("fire", 48, 192, 192),
        ("fire", 64, 256, 256),
        ("maxpool", 3, 2),
        ("fire", 64, 256, 256),
    ],
    "1.1": [
        ("conv", 64, 3, 2),
        ("maxpool", 3, 2),
        ("fire", 16, 64, 64),
        ("fire", 16, 64, 64),
        ("maxpool", 3, 2),
        ("fire", 32, 128, 128),
        ("fire", 32, 128, 128),
        ("maxpool", 3, 2),
        ("fire", 48, 192, 192),
        ("fire", 48, 192, 192),
        ("fire", 64, 256, 256),
        ("fire", 64, 256, 256),
    ],
}


def _fire(b: Builder, squeeze: int, expand_1x1: int, expand_3x3: int) -> nn.Sequential:
    block = nn.Sequential([
        b.conv_block(squeeze, kernel=1),
        nn.Concat([
            b.conv_block(expand_1x1, set_output=False, kernel=1),
            b.conv_block(expand_3x3, set_output=False, kernel=3, padding=1),
        ]),
    ])
    b.in_channels = expand_1x1 + expand_3x3
    return block


@register("squeezenet")
def build_squeezenet(setting) -> Model:
    b = Builder(setting)
    layers = []
    for cfg in CONFIG[str(setting.kind)]:
        op = cfg[0]
        if op == "fire":
            layers.append(_fire(b, *cfg[1:]))
        elif op == "maxpool":
            layers.append(nn.MaxPool2d(cfg[1], stride=cfg[2]))
        else:  # conv
            layers.append(b.conv_block(cfg[1], kernel=cfg[2], stride=cfg[3]))
    # fully-convolutional classifier (BN+ReLU on the 1x1 logits conv mirrors
    # the reference's conv2d_block here, squeezenet.py:106-123)
    layers += [
        b.dropout(),
        b.conv_block(setting.num_classes, kernel=1),
        nn.GlobalAvgPool2d(),
    ]
    return Model("SqueezeNet", setting, nn.Sequential(layers))
