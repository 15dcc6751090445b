"""Whole-model numerical parity against the ACTUAL PyTorch reference nets.

Loads the reference model files from /root/reference/src (stubbing the two
missing pip deps they import), builds each reference network, ports its
trained-initialization weights into our functional-JAX model (layout
transpose at the boundary, as tests/test_ops_parity.py does per-op), and
asserts eval-mode fp32 logits agree on random input — the north-star
"per-layer outputs match the PyTorch reference within fp32 tolerance"
obligation at full-network granularity (r2 VERDICT missing #1).

Weight matching is by EXECUTION ORDER: forward hooks give the reference's
parametric-leaf order; a recursive children() walk (containers preserve
construction = execution order) gives ours. Shapes are asserted pairwise
before any copy, so an order mismatch fails loudly, not numerically.

Reference architectures: resnet.py:110-117, densenet.py:105-169,
mobilenet_v1.py:42-125, shufflenet_v1.py:99-190, vggnet.py:62-94,
se_resnet.py:135-255.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_SRC),
                                reason="reference repo not present")


def _install_stubs():
    """Stub the two reference deps not in this env (torchsummary,
    torchvision) with just the attributes their import sites touch."""
    if "torchsummary" not in sys.modules:
        try:
            import torchsummary  # noqa: F401
        except ImportError:
            m = types.ModuleType("torchsummary")
            m.summary = lambda *a, **k: None
            sys.modules["torchsummary"] = m
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            ds = types.ModuleType("torchvision.datasets")
            ds.ImageFolder = object
            tf = types.ModuleType("torchvision.transforms")
            for name in ("Compose", "RandomCrop", "RandomHorizontalFlip",
                         "RandomAffine", "ToTensor", "Normalize", "Resize",
                         "CenterCrop"):
                setattr(tf, name, lambda *a, **k: None)
            tv.datasets, tv.transforms = ds, tf
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.datasets"] = ds
            sys.modules["torchvision.transforms"] = tf


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules (sibling flat imports)."""
    _install_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import importlib

    mods = {}
    for name in ("resnet", "densenet", "mobilenet_v1", "shufflenet_v1",
                 "vggnet", "se_resnet"):
        mods[name] = importlib.import_module(name)
    yield mods
    sys.path.remove(REF_SRC)


# --------------------------------------------------------------------------
# weight porting

def _torch_leaves(model, x):
    """Parametric leaves of the reference net in EXECUTION order."""
    order = []
    hooks = []
    for m in model.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.BatchNorm2d, torch.nn.Linear)):
            hooks.append(m.register_forward_hook(
                lambda mod, inp, out: order.append(mod)))
    model.eval()
    with torch.no_grad():
        logits = model(x)
    for h in hooks:
        h.remove()
    return order, logits.numpy()


def _our_leaves(module, path=()):
    """Parametric leaves of our module tree in execution order (container
    children() dicts preserve construction order == forward order).
    SEUnit holds its two no-bias FC weights inline (w1/w2) rather than as
    Linear children — emit them as virtual linear leaves so they pair with
    the reference's nn.Linear pair (reference se_resnet.py:233-235)."""
    from convnets_tpu import nn as L
    from convnets_tpu.models.blocks import SEUnit

    if isinstance(module, SEUnit):
        return [("se_fc", path, "w1"), ("se_fc", path, "w2")]
    if isinstance(module, (L.Conv2d, L.BatchNorm2d, L.Linear)):
        return [(module, path)]
    out = []
    for name, child in module.children().items():
        out.extend(_our_leaves(child, path + (name,)))
    return out


def _set_leaf(tree, path, leaf_name, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    assert leaf_name in node, f"missing {'/'.join(path)}/{leaf_name}"
    assert node[leaf_name].shape == value.shape, (
        f"shape mismatch at {'/'.join(path)}/{leaf_name}: "
        f"{node[leaf_name].shape} vs {value.shape}")
    node[leaf_name] = value.astype(np.asarray(node[leaf_name]).dtype)


def port_weights(ref_model, our_model, x_t, variables):
    """Copy every conv/bn/linear tensor from the reference net into our
    variables tree, transposing layouts at the boundary:
      conv   (O, I/g, kh, kw) -> HWIO (kh, kw, I/g, O)
      linear (out, in)        -> (in, out)
      bn     weight/bias/running_mean/running_var -> scale/bias/mean/var
    """
    from convnets_tpu import nn as L

    torder, ref_logits = _torch_leaves(ref_model, x_t)
    ours = _our_leaves(our_model.module)
    assert len(torder) == len(ours), (
        f"leaf count mismatch: reference {len(torder)} vs ours {len(ours)}")

    params = variables["params"]
    state = variables["state"]
    for tmod, oleaf in zip(torder, ours):
        if oleaf[0] == "se_fc":
            _, path, leaf_name = oleaf
            assert isinstance(tmod, torch.nn.Linear), f"{path}: expected Linear"
            assert tmod.bias is None  # reference SE FCs are bias-free
            _set_leaf(params, path, leaf_name, tmod.weight.detach().numpy().T)
            continue
        omod, path = oleaf
        if isinstance(tmod, torch.nn.Conv2d):
            assert isinstance(omod, L.Conv2d), f"{path}: {type(omod)} vs Conv2d"
            w = tmod.weight.detach().numpy().transpose(2, 3, 1, 0)
            _set_leaf(params, path, "w", w)
            if tmod.bias is not None:
                _set_leaf(params, path, "b", tmod.bias.detach().numpy())
        elif isinstance(tmod, torch.nn.BatchNorm2d):
            assert isinstance(omod, L.BatchNorm2d), f"{path}: {type(omod)} vs BN"
            _set_leaf(params, path, "scale", tmod.weight.detach().numpy())
            _set_leaf(params, path, "bias", tmod.bias.detach().numpy())
            _set_leaf(state, path, "mean", tmod.running_mean.detach().numpy())
            _set_leaf(state, path, "var", tmod.running_var.detach().numpy())
        elif isinstance(tmod, torch.nn.Linear):
            assert isinstance(omod, L.Linear), f"{path}: {type(omod)} vs Linear"
            _set_leaf(params, path, "w", tmod.weight.detach().numpy().T)
            if tmod.bias is not None:
                _set_leaf(params, path, "b", tmod.bias.detach().numpy())
    return ref_logits


# --------------------------------------------------------------------------
# the parity check

CASES = [
    # (ref module, ref class, ref kind, our arch, our kind)
    ("resnet", "ResNet", 26, "resnet", "26"),
    ("densenet", "DenseNet", 121, "densenet", "121"),
    ("mobilenet_v1", "MobileNetV1", "", "mobilenet_v1", "standard"),
    ("shufflenet_v1", "ShuffleNetV1", "g4", "shufflenet_v1", "g4"),
    ("vggnet", "VGGNet", 11, "vggnet", "11"),
    ("se_resnet", "SEResNet", 26, "se_resnet", "26"),
]


@pytest.mark.parametrize("ref_mod,ref_cls,ref_kind,arch,kind",
                         CASES, ids=[c[3] + "-" + str(c[4]) for c in CASES])
def test_logits_match_reference(ref, ref_mod, ref_cls, ref_kind, arch, kind):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings

    import settings as ref_settings  # reference module (sys.path has REF_SRC)

    torch.manual_seed(0)
    rsetting = ref_settings.Settings(
        kind=ref_kind, input_size=(3, 32, 32), num_classes=10)
    ref_model = getattr(ref[ref_mod], ref_cls)(rsetting)

    # randomize BN running stats so inference-mode parity actually
    # exercises them (fresh nets have mean=0/var=1)
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    setting = Settings(kind=kind, input_size=(3, 32, 32), num_classes=10,
                       mixed_precision=False, dropout_rate=0.0)
    our_model = build_model(arch, setting)
    import jax

    variables = jax.tree.map(np.asarray, our_model.init(jax.random.key(0)))

    x = np.random.RandomState(1).randn(4, 3, 32, 32).astype(np.float32)
    ref_logits = port_weights(ref_model, our_model, torch.from_numpy(x),
                              variables)

    our_logits, _ = our_model.module.apply(
        variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    our_logits = np.asarray(our_logits, np.float32)

    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits, ref_logits, atol=1e-4, rtol=1e-4)
