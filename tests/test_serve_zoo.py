"""Zoo-wide export coverage: every architecture family lowers through
jax.export and the deserialized artifact reproduces the live forward.

This exercises the structural variety of the zoo through the serving
path — grouped convs (ResNeXt/ShuffleNet), channel shuffle transposes,
SE global-pool attention, SK dynamic kernel selection, DenseNet concat
growth, Fire modules — none of which the lenet-based roundtrip tests in
test_serve.py touch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from convnets_tpu.models import build_model
from convnets_tpu.serve import export_model
from convnets_tpu.settings import Settings

ZOO_CASES = [
    ("alexnet", "cifar", 32),
    ("vggnet", "11", 32),
    ("inceptionnet_v1", "v1", 32),
    ("resnet", "26", 32),
    ("resnext", "26", 32),
    ("squeezenet", "1.1", 32),
    ("densenet", "121", 32),
    ("mobilenet_v1", "v1", 32),
    ("shufflenet_v1", "g4", 32),
    ("senet", "26", 32),
    ("se_resnet", "26", 32),
    ("sknet", "26", 32),
    ("sk_resnet", "26", 32),
]


@pytest.mark.parametrize("arch,kind,size", ZOO_CASES)
def test_zoo_exports_and_matches_live(arch, kind, size):
    setting = Settings(kind=kind, input_size=(3, size, size), num_classes=10,
                       batch_size=2, mixed_precision=False,
                       data_augment=False, data_norm=False)
    model = build_model(arch, setting)
    variables = model.init(batch_size=2)
    exported = export_model(model, variables, batch_size=2)

    x = np.random.RandomState(0).rand(2, size, size, 3).astype(np.float32)
    import jax

    got = np.asarray(jax.jit(exported.call)(jnp.asarray(x)))
    live, _ = model.apply(variables, jnp.asarray(x), train=False)
    assert got.shape == (2, 10)
    np.testing.assert_allclose(got, np.asarray(live), rtol=1e-4, atol=1e-4)
