"""Template for adding a new architecture — the counterpart of reference
template_net.py:17-66. Copy this file, rename 'mynetwork', fill in the
layers, and the model becomes available through build_model()/the CLI.
"""

from __future__ import annotations

from convnets_tpu import nn
from convnets_tpu.models.base import Builder, Model, register

# Variant configs keyed by Settings.kind
CONFIG = {
    "base": [32, 64],
}


@register("mynetwork")
def build_mynetwork(setting) -> Model:
    filters = CONFIG[str(setting.kind)]
    b = Builder(setting)
    layers = []
    for f in filters:
        layers.append(b.conv_block(f, kernel=3, padding=1))
        layers.append(nn.MaxPool2d(2, stride=2))
    layers += [
        nn.GlobalAvgPool2d(),
        b.dropout(),
        b.linear(setting.num_classes),
    ]
    return Model("MyNetwork", setting, nn.Sequential(layers))
