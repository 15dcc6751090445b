"""AlexNet (one of BASELINE.json's benchmark config classes; not in the
reference zoo — provided for coverage of the classic-CNN benchmark suite).

Two variants keyed by Settings.kind:
  "imagenet": the original 224×224 geometry (11×11/4 stem, LRN replaced by
              BN as the reference does for its nets, e.g. vggnet.py:20-23)
  "cifar":    3×3-stem adaptation for 32×32 inputs (stride-1 stem, same
              channel progression), the common small-image AlexNet.
"""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register


@register("alexnet")
def build_alexnet(setting) -> Model:
    kind = str(setting.kind) or "imagenet"
    b = Builder(setting)
    if kind == "imagenet":
        layers = [
            b.conv_block(64, kernel=11, stride=4, padding=2),
            nn.MaxPool2d(3, stride=2),
            b.conv_block(192, kernel=5, padding=2),
            nn.MaxPool2d(3, stride=2),
            b.conv_block(384, kernel=3, padding=1),
            b.conv_block(256, kernel=3, padding=1),
            b.conv_block(256, kernel=3, padding=1),
            nn.MaxPool2d(3, stride=2),
        ]
    elif kind == "cifar":
        layers = [
            b.conv_block(64, kernel=3, stride=1, padding=1),
            nn.MaxPool2d(2, stride=2),
            b.conv_block(192, kernel=3, padding=1),
            nn.MaxPool2d(2, stride=2),
            b.conv_block(384, kernel=3, padding=1),
            b.conv_block(256, kernel=3, padding=1),
            b.conv_block(256, kernel=3, padding=1),
            nn.MaxPool2d(2, stride=2),
        ]
    else:
        raise KeyError(f"alexnet kind must be 'imagenet' or 'cifar', got {kind!r}")
    layers += [
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(4096),
        nn.ReLU(),
        b.dropout(),
        b.linear(4096),
        nn.ReLU(),
        b.linear(setting.num_classes),
    ]
    return Model("AlexNet", setting, nn.Sequential(layers))
