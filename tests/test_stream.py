"""ShardRotationLoader (chunked HBM rotation, r3 VERDICT missing #1):
epoch coverage, chunk-shape invariants, training equivalence with the
fully-resident DeviceCacheLoader, chunked eval with prediction
collection, and the memmap-build decode cache for >RAM-budget splits.
Reference slot: the torch DataLoader feeding ImageNet-class training
(reference mngrdata.py:139-165)."""

import os

import numpy as np
import jax
import pytest

from convnets_tpu.data import synthetic_dataset
from convnets_tpu.data.loader import DeviceCacheLoader
from convnets_tpu.data.stream import ShardRotationLoader
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import Trainer


def tiny_chunks_loader(ds, bs, **kw):
    # chunk_bytes sized to a couple of batches so even tiny fixtures
    # exercise multi-chunk rotation
    img_bytes = int(np.prod(ds.image_shape))
    return ShardRotationLoader(ds, bs, chunk_bytes=2 * bs * img_bytes, **kw)


def test_epoch_chunks_cover_every_example_once():
    ds = synthetic_dataset(50, (8, 8, 3), 4, seed=0)
    loader = tiny_chunks_loader(ds, 8, shuffle=True, seed=3)
    assert loader.num_chunks == 4  # ceil(ceil(50/8)=7 batches / 2 per chunk)

    served = []
    shapes = set()
    for ch in loader.epoch_chunks():
        shapes.add((np.asarray(ch.data).shape, ch.idx_mat.shape))
        flat_idx = ch.idx_mat.reshape(-1)
        flat_w = ch.w_mat.reshape(-1)
        labels = np.asarray(ch.labels)
        for i, w in zip(flat_idx, flat_w):
            if w > 0:
                served.append(int(labels[i]))
    # every chunk (incl. the padded final one) has identical device shapes
    assert len(shapes) == 1
    assert len(served) == 50
    # the epoch's label multiset matches the dataset's exactly
    assert sorted(served) == sorted(int(v) for v in ds.all_labels())
    assert loader.epoch == 1


def test_epoch_chunks_shuffle_is_seeded_and_reshuffles():
    ds = synthetic_dataset(40, (8, 8, 3), 4, seed=0)

    def first_chunk_labels(loader):
        ch = next(iter(loader.epoch_chunks()))
        return np.asarray(ch.labels).tolist()

    a = tiny_chunks_loader(ds, 8, shuffle=True, seed=7)
    b = tiny_chunks_loader(ds, 8, shuffle=True, seed=7)
    e0_a, e0_b = first_chunk_labels(a), first_chunk_labels(b)
    assert e0_a == e0_b            # same seed+epoch → same permutation
    e1_a = first_chunk_labels(a)   # epoch 1 reshuffles
    assert e1_a != e0_a


def test_drop_last_serves_full_batches_only():
    ds = synthetic_dataset(50, (8, 8, 3), 4, seed=0)
    loader = tiny_chunks_loader(ds, 8, shuffle=False, drop_last=True)
    total = sum(int(ch.w_mat.sum()) for ch in loader.epoch_chunks())
    assert total == 48  # 6 full batches

    batches = list(iter(tiny_chunks_loader(ds, 8, drop_last=True)))
    assert len(batches) == 6
    assert all(w.sum() == 8 for _, _, w in batches)


def make_setting(tmp_path, **kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("epochs", 2)
    kw.setdefault("learning_rate", 2e-3)
    kw.setdefault("mixed_precision", False)
    kw.setdefault("data_augment", False)
    kw.setdefault("data_norm", False)
    kw.setdefault("early_stop", False)
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("output_dir", str(tmp_path))
    return Settings(kind=0, input_size=(3, 16, 16), num_classes=4, **kw)


def test_chunked_training_matches_resident(tmp_path):
    """2-epoch fit through the chunk rotation == through the fully
    resident DeviceCacheLoader: same permutations, same batches, so the
    parameter trajectory is bit-identical (augment/dropout off — the
    per-step RNG stream is the one thing chunking re-keys)."""
    ds = synthetic_dataset(48, (16, 16, 3), 4, seed=0)
    vds = synthetic_dataset(16, (16, 16, 3), 4, seed=1)

    def run(loader_cls, outdir):
        setting = make_setting(tmp_path / outdir)
        model = build_model("lenet", setting)
        trainer = Trainer(model, optimizer="sgd")
        if loader_cls is ShardRotationLoader:
            train = tiny_chunks_loader(ds, 8, shuffle=True, seed=0)
            valid = tiny_chunks_loader(vds, 8)
        else:
            train = loader_cls(ds, 8, shuffle=True, seed=0)
            valid = loader_cls(vds, 8)
        trainer.fit(train, valid)
        trainer.close()
        return trainer

    ta = run(DeviceCacheLoader, "resident")
    tb = run(ShardRotationLoader, "chunked")

    for k in ("train_score", "valid_score"):
        assert ta.epoch_results[k] == tb.epoch_results[k], k
    np.testing.assert_allclose(ta.epoch_results["train_loss"],
                               tb.epoch_results["train_loss"], rtol=1e-6)
    la, lb = (jax.tree.leaves(t.state.params) for t in (ta, tb))
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_evaluate_collects_predictions(tmp_path):
    ds = synthetic_dataset(48, (16, 16, 3), 4, seed=0)
    setting = make_setting(tmp_path, epochs=1)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    train = tiny_chunks_loader(ds, 8, shuffle=True, seed=0)
    valid = tiny_chunks_loader(ds, 8)
    trainer.fit(train, valid)
    score = trainer.evaluate(valid, info=True)  # builds confusion matrix
    trainer.close()
    assert 0.0 <= score <= 1.0
    cm = trainer.confusion_matrix
    assert cm.sum() == 48  # every (unpadded) example judged exactly once


def test_manager_picks_shard_rotation_for_big_splits(tmp_path, monkeypatch):
    from convnets_tpu.data.manager import DataMngr
    from PIL import Image

    root = tmp_path / "set"
    rng = np.random.RandomState(0)
    for split in ("train", "valid", "test"):
        for c in ("a", "b"):
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)
                                ).save(d / f"{i}.png")
    monkeypatch.setattr(DataMngr, "CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(DataMngr, "DEVICE_CACHE_AUTO_BYTES", 1)  # force >HBM
    setting = make_setting(tmp_path, batch_size=4)
    mngr = DataMngr(setting, root=str(root))
    loader = mngr.load_train()
    assert isinstance(loader, ShardRotationLoader)
    x, y, w = next(iter(loader))
    assert x.shape == (4, 8, 8, 3)

    monkeypatch.setenv("CONVNETS_TPU_STREAM", "0")
    mngr2 = DataMngr(setting, root=str(root))
    from convnets_tpu.data.loader import DataLoader
    assert type(mngr2.load_train()) is DataLoader


def test_memmap_build_decode_cache(tmp_path, monkeypatch):
    """Splits over the RAM cache budget decode straight into a disk
    memmap (.building.npy → atomic publish), and a fresh dataset then
    serves from the published cache without re-decoding."""
    from convnets_tpu.data.datasets import ImageFolderDataset
    from PIL import Image

    root = tmp_path / "set"
    rng = np.random.RandomState(0)
    for c in ("a", "b"):
        d = root / c
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                d / f"{i}.png")
    cache = str(tmp_path / "cache" / "set.npy")
    monkeypatch.setattr(ImageFolderDataset, "CACHE_BUDGET_BYTES", 1)
    ds1 = ImageFolderDataset(str(root), disk_cache=cache)
    assert ds1._memmap_build
    x1, y1 = ds1.load_raw(np.arange(len(ds1)))
    assert os.path.exists(cache)
    assert not os.path.exists(cache + ".building.npy")
    assert not ds1._memmap_build  # published + reopened read-only

    ds2 = ImageFolderDataset(str(root), disk_cache=cache)
    assert ds2._cached.all()  # served from the published cache
    x2, y2 = ds2.load_raw(np.arange(len(ds2)))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
