"""SKNet — selective kernels on a ResNeXt-style trunk, reference
sknet.py:30-242: widths 128-1024, expansion 2; SKBottleneck =
1x1 → SKConv(stride) → 1x1·exp, + shortcut, post-add ReLU."""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register
from convnets_tpu.models.blocks import SKConv

CONFIG = {
    "26": [(128, 2, 1), (256, 2, 2), (512, 2, 2), (1024, 2, 2)],
    "50": [(128, 3, 1), (256, 4, 2), (512, 6, 2), (1024, 3, 2)],
    "101": [(128, 3, 1), (256, 4, 2), (512, 23, 2), (1024, 3, 2)],
    "152": [(128, 3, 1), (256, 8, 2), (512, 36, 2), (1024, 3, 2)],
}


def sk_bottleneck(b: Builder, filters: int, expansion: int, stride: int = 1,
                  cardinality: int = 32):
    out_ch = filters * expansion
    needs_synch = stride != 1 or b.in_channels != out_ch
    shortcut = (
        b.conv_block(out_ch, activation=False, set_output=False, kernel=1, stride=stride)
        if needs_synch else nn.Identity()
    )
    body = nn.Sequential([
        b.conv_block(filters, kernel=1),
        SKConv(b, groups=cardinality, stride=stride),
        b.conv_block(out_ch, activation=False, kernel=1),
    ])
    b.in_channels = out_ch
    return nn.Add([body, shortcut], post_relu=True)


@register("sknet")
def build_sknet(setting) -> Model:
    stages = CONFIG[str(setting.kind)]
    b = Builder(setting)
    layers = [
        b.conv_block(64, kernel=7, stride=2, padding=3),
        nn.MaxPool2d(3, stride=2, padding=1),
    ]
    for filters, repeats, stride in stages:
        layers.append(sk_bottleneck(b, filters, 2, stride))
        for _ in range(1, repeats):
            layers.append(sk_bottleneck(b, filters, 2))
    layers += [
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(setting.num_classes),
    ]
    return Model("SKNet", setting, nn.Sequential(layers))
