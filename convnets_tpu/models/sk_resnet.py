"""SK-ResNet — selective kernels on a plain ResNet trunk, reference
sk_resnet.py:30-240: widths 64-512, expansion 4; SKResBottleneck =
1x1 → SKConv(stride, groups=32) → 1x1·4."""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register
from convnets_tpu.models.sknet import sk_bottleneck

CONFIG = {
    "26": [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)],
    "50": [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
    "101": [(64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2)],
    "152": [(64, 3, 1), (128, 8, 2), (256, 36, 2), (512, 3, 2)],
}


@register("sk_resnet")
def build_sk_resnet(setting) -> Model:
    stages = CONFIG[str(setting.kind)]
    b = Builder(setting)
    layers = [
        b.conv_block(64, kernel=7, stride=2, padding=3),
        nn.MaxPool2d(3, stride=2, padding=1),
    ]
    for filters, repeats, stride in stages:
        layers.append(sk_bottleneck(b, filters, 4, stride))
        for _ in range(1, repeats):
            layers.append(sk_bottleneck(b, filters, 4))
    layers += [
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(setting.num_classes),
    ]
    return Model("SKResNet", setting, nn.Sequential(layers))
