"""MNIST/CIFAR binary-format loaders + AlexNet variants."""

import gzip
import os
import pickle
import struct

import numpy as np
import jax.numpy as jnp

from convnets_tpu.data import cifar10, mnist
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings


def test_mnist_idx_loader(tmp_path):
    rng = np.random.RandomState(0)
    n = 10
    images = rng.randint(0, 255, (n, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28) + images.tobytes())
    with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, n) + labels.tobytes())

    ds = mnist(str(tmp_path), "train")
    assert len(ds) == n and ds.image_shape == (28, 28, 1)
    x, y = ds.load(np.arange(3))
    assert x.shape == (3, 28, 28, 1) and x.dtype == np.float32
    np.testing.assert_array_equal(y, labels[:3])
    np.testing.assert_allclose(x[..., 0] * 255, images[:3], atol=0.5)


def test_cifar10_pickle_loader(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    for name, n in [("data_batch_1", 6), ("test_batch", 4)]:
        d = {b"data": rng.randint(0, 255, (n, 3072), dtype=np.uint8),
             b"labels": rng.randint(0, 10, n).tolist()}
        with open(base / name, "wb") as f:
            pickle.dump(d, f)
    # only batch 1 present → train load must fail loudly, test split works
    ds = cifar10(str(tmp_path), "test")
    assert len(ds) == 4 and ds.image_shape == (32, 32, 3)
    assert ds.class_names[0] == "airplane"


def test_alexnet_variants():
    for kind, size in [("imagenet", 224), ("cifar", 32)]:
        setting = Settings(kind=kind, input_size=(3, size, size), num_classes=10,
                           mixed_precision=False, dropout_rate=0.5)
        model = build_model("alexnet", setting)
        v = model.init(batch_size=1)
        logits, _ = model.module.apply(v, jnp.ones((1, size, size, 3)), train=False)
        assert logits.shape == (1, 10)
    # conv trunk matches canonical AlexNet; head follows this repo's
    # reference-style GAP-before-classifier modification (vggnet.py:20-23),
    # so the count is trunk(≈3.7M) + 256·4096 + 4096·4096 + 4096·1000 ≈ 24.4M
    setting = Settings(kind="imagenet", input_size=(3, 224, 224), num_classes=1000,
                       batch_norm=False, mixed_precision=False)
    model = build_model("alexnet", setting)
    v = model.init(batch_size=1)
    n = model.num_params(v)
    assert 23_000_000 < n < 26_000_000


def test_mnist_trains_with_data_norm(tmp_path):
    """Regression: data_norm=True with a 1-channel dataset must use the
    dataset's own stats, not broadcast against CINIC's 3-channel ones."""
    from convnets_tpu.data import DataLoader
    from convnets_tpu.train import Trainer

    rng = np.random.RandomState(0)
    n = 16
    images = rng.randint(0, 255, (n, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28) + images.tobytes())
    with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, n) + labels.tobytes())

    ds = mnist(str(tmp_path), "train")
    assert ds.mean.shape == (1,)
    loader = DataLoader(ds, 8)
    setting = Settings(kind=0, input_size=(1, 28, 28), num_classes=10,
                       batch_size=8, epochs=1, mixed_precision=False,
                       data_augment=False, data_norm=True, dropout_rate=0.0,
                       sanity_check=True, output_dir=str(tmp_path))
    from convnets_tpu.models import build_model as bm
    trainer = Trainer(bm("lenet", setting))
    trainer.fit(loader, loader)  # would raise a channel mismatch before the fix
    assert trainer.epoch_results["train_loss"]
