"""DenseNet-121/169/201/264/161, reference densenet.py:30-189:
(growth_rate, block_sizes, init_features) config; DenseLayer =
BN→ReLU→Dropout→1x1(4g) then BN→ReLU→Dropout→3x3(g), concat with input;
TransitionBlock = BN→ReLU→1x1(C/2)→avgpool2. Note the pre-activation BNs are
unconditional in the reference (raw nn.BatchNorm2d) while conv bias still
follows `not batch_norm`."""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register

CONFIG = {
    "121": (32, [6, 12, 24, 16], 64),
    "169": (32, [6, 12, 32, 32], 64),
    "201": (32, [6, 12, 48, 32], 64),
    "264": (32, [6, 12, 64, 48], 64),
    "161": (48, [6, 12, 36, 24], 96),
}


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
