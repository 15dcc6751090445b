"""On-device augmentation: the 224-class RandomResizedCrop/CenterCrop path
(BASELINE.json configs #2/#3) and its engine integration — input batches
larger than the model input are cropped+resized inside the jitted step."""

import numpy as np
import jax
import jax.numpy as jnp

from convnets_tpu.data import DataLoader, synthetic_dataset
from convnets_tpu.data.augment import (
    augment_batch, center_crop_resize, random_resized_crop_batch,
)
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import Trainer


def test_random_resized_crop_shape_and_range():
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3))
    y = random_resized_crop_batch(jax.random.key(1), x, (24, 24))
    assert y.shape == (4, 24, 24, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0 + 1e-6
    # different keys give different crops
    y2 = random_resized_crop_batch(jax.random.key(2), x, (24, 24))
    assert not np.allclose(y, y2)


def test_random_resized_crop_full_scale_is_resize():
    """scale=1, ratio=1, no flip → the whole image resized to out_hw."""
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    got = random_resized_crop_batch(
        jax.random.key(1), x, (16, 16), scale_range=(1.0, 1.0),
        ratio_range=(1.0, 1.0), hflip_p=0.0)
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-5)


def test_center_crop_resize_identity():
    """enlarge=1 at matching sizes is the identity resample."""
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    got = center_crop_resize(x, (16, 16), enlarge=1.0)
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-5)


def test_center_crop_resize_crops_center():
    """enlarge=2 on a half-scale target reads the central quarter."""
    x = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12, :].set(1.0)
    got = center_crop_resize(x, (8, 8), enlarge=2.0)
    np.testing.assert_allclose(got, np.ones((1, 8, 8, 1)), atol=1e-5)


def test_augment_batch_preserves_shape():
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3))
    y = augment_batch(jax.random.key(1), x, do_affine=True)
    assert y.shape == x.shape


def test_engine_crops_oversized_inputs(tmp_path):
    """Feed 24×24 batches to a 16×16-input model: the train step random-
    resize-crops, the eval step center-crops, end to end."""
    setting = Settings(
        kind=0, input_size=(3, 16, 16), num_classes=4, batch_size=16,
        epochs=1, learning_rate=1e-3, data_augment=True, data_norm=False,
        mixed_precision=False, early_stop=False, dropout_rate=0.0,
        output_dir=str(tmp_path),
    )
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train = DataLoader(synthetic_dataset(32, (24, 24, 3), 4, seed=0),
                       16, shuffle=True)
    valid = DataLoader(synthetic_dataset(16, (24, 24, 3), 4, seed=1), 16)
    trainer.fit(train, valid)
    assert len(trainer.epoch_results["train_loss"]) == 1
    score = trainer.evaluate(valid)
    assert 0.0 <= score <= 1.0


def test_separable_resample_matches_gather_path():
    """The MXU (two-einsum) axis-aligned resample must reproduce the
    gather-based _bilinear_sample exactly, including the zero-outside-
    extent border convention (coordinates past the edge keep only the
    partial in-range tap)."""
    import numpy as np

    from convnets_tpu.data.augment import _bilinear_sample, _separable_resample

    rng = np.random.RandomState(0)
    n, h, w, c = 4, 19, 23, 3
    x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    ys1 = jnp.asarray(rng.uniform(-1.5, h + 0.5, (n, 11)).astype(np.float32))
    xs1 = jnp.asarray(rng.uniform(-1.5, w + 0.5, (n, 13)).astype(np.float32))
    ys2 = jnp.broadcast_to(ys1[:, :, None], (n, 11, 13))
    xs2 = jnp.broadcast_to(xs1[:, None, :], (n, 11, 13))
    a = _bilinear_sample(x, xs2, ys2)
    b = _separable_resample(x, ys1, xs1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cutout_masks_one_square():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnets_tpu.data.augment import cutout

    x = jnp.ones((4, 16, 16, 3), jnp.float32)
    y = np.asarray(cutout(jax.random.key(0), x, 8))
    zeros = (y == 0).all(axis=-1)          # (N, H, W) occluded mask
    for i in range(4):
        n0 = int(zeros[i].sum())
        # center uniform over the image: the square may hang off the
        # edges, so 16 <= occluded area <= 64 for size 8 on 16x16
        assert 4 * 4 <= n0 <= 8 * 8
        ys, xs = np.where(zeros[i])
        # occlusion is one contiguous axis-aligned rectangle
        assert (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1) == n0
    # kept pixels untouched
    assert float(y.max()) == 1.0


def test_cutout_zero_size_is_identity_stream():
    """Settings.cutout=0 must not perturb the augment RNG stream: the
    preprocess path only splits the key when cutout is on."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnets_tpu.data.augment import augment_batch

    key = jax.random.key(7)
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    a = augment_batch(key, x, do_affine=False)
    b = augment_batch(key, x, do_affine=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
