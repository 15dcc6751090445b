"""Model zoo tests: exact parameter-count parity with the reference's
published configs (BASELINE.md table) and forward-shape checks for every
architecture."""

import jax
import jax.numpy as jnp
import pytest

from convnets_tpu.models import build_model, available_models
from convnets_tpu.settings import Settings


def make_setting(kind, **kw):
    kw.setdefault("mixed_precision", False)
    return Settings(kind=kind, input_size=(3, 32, 32), num_classes=10, **kw)


# exact torchsummary totals from /root/reference/data/results.xlsx (BASELINE.md)
PARAM_TABLE = [
    ("vggnet", "11", 28146762),
    ("inceptionnet_v1", "v1", 5991082),
    ("resnet", "26", 13966666),
    ("squeezenet", "1.1", 730580),
    ("densenet", "121", 6964106),
    ("mobilenet_v1", "v1", 3217226),
    ("shufflenet_v1", "g4", 890234),
    ("se_resnet", "26", 15359306),
    ("sk_resnet", "26", 8283978),
]


@pytest.mark.parametrize("arch,kind,expected", PARAM_TABLE)
def test_param_count_parity(arch, kind, expected):
    m = build_model(arch, make_setting(kind))
    v = m.init(jax.random.key(0))
    assert m.num_params(v) == expected


FORWARD_CASES = [
    ("convnet", "0"),
    ("lenet", "5"),
    ("vggnet", "11"),
    ("inceptionnet_v1", "v1"),
    ("resnet", "18"),
    ("resnet", "26"),
    ("resnext", "26"),
    # squeezenet-1.0's 7x7/2 stem + three k3/s2 maxpools collapses 32x32
    # inputs to zero spatial (torch raises there too; the reference only
    # benchmarks v1.1 at 32x32) — cover 1.0 at a valid size instead
    ("squeezenet", "1.0-64"),
    ("densenet", "121"),
    ("mobilenet_v1", "v1"),
    ("shufflenet_v1", "g3"),
    ("senet", "26"),
    ("se_resnet", "18"),
    ("sknet", "26"),
    ("sk_resnet", "26"),
    ("mynetwork", "base"),
]


@pytest.mark.parametrize("arch,kind", FORWARD_CASES)
def test_forward_shapes_and_state(arch, kind):
    size = 32
    if kind.endswith("-64"):
        kind, size = kind[:-3], 64
    setting = make_setting(kind)
    setting.input_size = (3, size, size)
    m = build_model(arch, setting)
    v = m.init(jax.random.key(0), batch_size=2)
    x = jnp.ones((2, size, size, 3), jnp.float32)

    # analytic shape must match the traced shape
    assert m.out_shape(2) == (2, 10)
    logits, new_state = m.apply(v, x, train=True, rng=jax.random.key(1))
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32
    if v["state"]:
        # training must update BN running stats
        assert jax.tree.leaves(new_state), f"{arch} produced no state updates"
    # eval mode works and produces no state
    logits_eval, ns = m.apply(v, x, train=False)
    assert logits_eval.shape == (2, 10)
    assert not jax.tree.leaves(ns)


def test_registry_covers_reference_zoo():
    required = {
        "convnet", "lenet", "vggnet", "inceptionnet_v1", "resnet", "resnext",
        "squeezenet", "densenet", "mobilenet_v1", "shufflenet_v1",
        "senet", "se_resnet", "sknet", "sk_resnet", "mynetwork",
    }
    assert required.issubset(set(available_models()))
