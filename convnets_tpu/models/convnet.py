"""ConvNet — the demo network of the reference engine
(reference basemodel.py:1070-1129) — plus LeNet-5 (the CPU-runnable
MNIST baseline config from BASELINE.json).
"""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register


@register("convnet")
def build_convnet(setting) -> Model:
    """conv3x3(32)→pool → conv5x5(64,s2,p1)→pool → FC2048 → FC(classes)."""
    b = Builder(setting)
    module = nn.Sequential([
        b.conv_block(32, kernel=3),
        nn.MaxPool2d(2, stride=2),
        b.conv_block(64, kernel=5, stride=2, padding=1),
        nn.MaxPool2d(2, stride=2),
        nn.Flatten(),
        b.linear(2048),
        nn.ReLU(),
        b.dropout(),
        b.linear(setting.num_classes),
    ])
    return Model("ConvNet", setting, module)


@register("lenet")
def build_lenet(setting) -> Model:
    """LeNet-5 (modernized: ReLU + maxpool): conv5(6)→pool→conv5(16)→pool→
    FC120→FC84→FC(classes). kind is unused (single variant)."""
    b = Builder(setting)
    module = nn.Sequential([
        b.conv_block(6, kernel=5, padding=2),
        nn.MaxPool2d(2, stride=2),
        b.conv_block(16, kernel=5),
        nn.MaxPool2d(2, stride=2),
        nn.Flatten(),
        b.linear(120),
        nn.ReLU(),
        b.linear(84),
        nn.ReLU(),
        b.dropout(),
        b.linear(setting.num_classes),
    ])
    return Model("LeNet", setting, module)
