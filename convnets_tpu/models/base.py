"""Model wrapper and shared builder helpers.

A model here is a pure description: ``Model`` bundles a name, the Settings,
and one root ``nn.Module`` whose output is the logits. The reference's
stateful base class (reference basemodel.py:33-108) maps onto:

  reference                       here
  ---------                       ----
  Model(setting) constructor      build_model(arch, setting) → Model
  self.features/classifier        one Sequential module tree
  init_params()                   Module.init(key) with init_mode from
                                  setting.init_params
  num_flat_features()             analytic out_shape chain
  print_summary()                 Model.summary()
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax

from convnets_tpu import nn
from convnets_tpu.core.precision import policy_from_setting
from convnets_tpu.core.rng import key_for
from convnets_tpu.settings import Settings


class Model:
    """A named, configured network: pure init/apply over one module tree."""

    def __init__(self, name: str, setting: Settings, module: nn.Module):
        self.arch = name
        self.model_name = name + str(setting.kind)
        self.version = int(time.time())
        self.setting = setting
        self.module = module
        self.policy = policy_from_setting(setting)
        self.input_shape_nhwc = setting.input_shape_nhwc
        self._init_fns = {}
        self._apply_fns = {}

    def batch_shape(self, batch_size: int):
        return (batch_size, *self.input_shape_nhwc)

    def init(self, key=None, batch_size: int = 1) -> dict:
        """Initialize variables. The whole init graph is jitted: one XLA
        compilation instead of one eager dispatch per parameter (which is
        ~100ms each on CPU for deep nets like DenseNet)."""
        if key is None:
            key = key_for(self.setting.seed, "init")
        shape = self.batch_shape(batch_size)
        fn = self._init_fns.get(shape)
        if fn is None:
            fn = jax.jit(lambda k: self.module.init(k, shape))
            self._init_fns[shape] = fn
        return fn(key)

    def apply(self, variables, x, *, train: bool = False, rng=None):
        """Logits forward pass (jitted, cached per train flag).
        Returns (logits_fp32, new_state)."""
        fn = self._apply_fns.get(train)
        if fn is None:
            def run(variables, x, rng):
                y, new_state = self.module.apply(variables, x, train=train, rng=rng)
                return self.policy.cast_to_output(y), new_state
            fn = jax.jit(run)
            self._apply_fns[train] = fn
        if rng is None:
            rng = jax.random.key(0)
        return fn(variables, x, rng)

    def out_shape(self, batch_size: int = 1):
        return self.module.out_shape(self.batch_shape(batch_size))

    def num_params(self, variables) -> int:
        return nn.count_params(variables["params"])

    def summary(self, variables=None, batch_size: int = 1) -> str:
        head = f"=== {self.model_name} (input {self.batch_shape(batch_size)}) ==="
        body = nn.summarize(self.module, self.batch_shape(batch_size), variables)
        return head + "\n" + body

    def __repr__(self):
        return f"Model({self.model_name})"


class Builder:
    """Shared state for model builders: tracks current channel count and maps
    Settings fields (batch_norm / init_params / dropout_rate) onto layers —
    the functional counterpart of the reference's builder DSL
    (basemodel.py:966-1067, bias off iff BN on at :973)."""

    def __init__(self, setting: Settings):
        self.setting = setting
        self.in_channels = setting.input_size[0]
        self.bn = bool(setting.batch_norm)
        self.conv_init = "he" if setting.init_params else "default"
        self.linear_init = "normal" if setting.init_params else "default"

    def conv(self, num_filters, set_output=True, **kw) -> nn.Conv2d:
        layer = nn.Conv2d(num_filters, bias=not self.bn, init_mode=self.conv_init, **kw)
        if set_output:
            self.in_channels = num_filters
        return layer

    def conv_block(self, num_filters, activation=True, set_output=True, groups=1,
                   kernel=3, stride=1, padding=0, dilation=1) -> nn.Sequential:
        # nn.conv_block returns the fused ConvBNReLU when BN is on — same
        # child tree ('0' conv, '1' bn, '2' relu), Pallas-fused apply
        block = nn.conv_block(num_filters, kernel, stride=stride,
                              padding=padding, dilation=dilation, groups=groups,
                              batch_norm=self.bn, act=activation,
                              init_mode=self.conv_init)
        if set_output:
            self.in_channels = num_filters
        return block

    def conv_block_depthwise(self, kernel=3, stride=1, padding=0, activation=True) -> nn.Sequential:
        """Depthwise conv (+BN+ReLU): groups == in_channels, multiplier 1
        (reference conv2d_depthwise, basemodel.py:981-997)."""
        c = self.in_channels
        return self.conv_block(c, kernel=kernel, stride=stride, padding=padding,
                               groups=c, activation=activation)

    def linear(self, out_features) -> nn.Linear:
        return nn.Linear(out_features, init_mode=self.linear_init)

    def dropout(self) -> nn.Dropout:
        return nn.Dropout(self.setting.dropout_rate)


# ---------------------------------------------------------------------------
# Registry

_REGISTRY: Dict[str, Callable[[Settings], Model]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def build_model(arch: str, setting: Settings) -> Model:
    """Construct a model under the dtype policy implied by the settings."""
    if arch not in _REGISTRY:
        raise KeyError(f"unknown architecture '{arch}'; have {sorted(_REGISTRY)}")
    with nn.use_policy(policy_from_setting(setting)):
        model = _REGISTRY[arch](setting)
    model.registry_name = arch
    return model


def available_models():
    return sorted(_REGISTRY)
