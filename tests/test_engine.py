"""End-to-end engine tests on the 8-device CPU mesh: fit reduces loss,
checkpoints round-trip bit-exactly, resume continues training, evaluate and
test produce the full metric surface. Mirrors the reference's own smoke
cycle (basemodel.py:1132-1215: train→checkpoint→resume→evaluate→test)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convnets_tpu.data import ArrayDataset, DataLoader, synthetic_dataset
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import Trainer
from convnets_tpu.train import checkpoint as ckpt


def make_setting(tmp_path, **kw):
    kw.setdefault("batch_size", 16)
    kw.setdefault("epochs", 3)
    kw.setdefault("learning_rate", 1e-3)
    kw.setdefault("mixed_precision", False)
    kw.setdefault("data_augment", False)
    kw.setdefault("data_norm", False)
    kw.setdefault("early_stop", False)
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("output_dir", str(tmp_path))
    return Settings(kind=0, input_size=(3, 16, 16), num_classes=4, **kw)


def make_loaders(n_train=64, n_valid=32, batch=16):
    train = DataLoader(synthetic_dataset(n_train, (16, 16, 3), 4, seed=0),
                       batch, shuffle=True, seed=0)
    valid = DataLoader(synthetic_dataset(n_valid, (16, 16, 3), 4, seed=1),
                       batch, shuffle=False)
    return train, valid


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    setting = make_setting(tmp)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)
    return trainer, setting, tmp


def test_fit_reduces_loss(fitted):
    trainer, _, _ = fitted
    r = trainer.epoch_results
    assert len(r["train_loss"]) == 3
    assert r["train_loss"][-1] < r["train_loss"][0]
    assert r["total_epochs"] == 3
    assert r["train_time"] > 0


def test_checkpoint_written_and_roundtrip(fitted):
    trainer, setting, tmp = fitted
    path = ckpt.get_last_checkpoint(str(tmp), trainer.model.model_name)
    assert path is not None

    # fresh trainer loads it bit-exactly
    model2 = build_model("lenet", setting)
    trainer2 = Trainer(model2)
    meta = trainer2.load_checkpoint(path)
    assert meta["optimizer"] == "adam"
    for a, b in zip(jax.tree.leaves(trainer2.state.params),
                    jax.tree.leaves(trainer.state.params)):
        # checkpoint holds the *best* epoch params, trainer holds the last;
        # so compare structure, then verify save/load identity directly
        assert a.shape == b.shape

    p1 = trainer.save_checkpoint(os.path.join(str(tmp), "x-1-best_score.ckpt.npz"))
    trees, _ = ckpt.load_checkpoint(p1)
    for a, b in zip(jax.tree.leaves(trees["params"]),
                    jax.tree.leaves(jax.device_get(trainer.state.params))):
        np.testing.assert_array_equal(a, b)


def test_resume_continues(fitted):
    trainer, setting, tmp = fitted
    model2 = build_model("lenet", setting)
    trainer2 = Trainer(model2)
    trainer2.load_checkpoint(trainer.model_path)
    prev_epochs = trainer2.epoch_results["train_epochs"]
    train, valid = make_loaders()
    setting.epochs = 2
    trainer2.fit(train, valid, resume=True)
    r = trainer2.epoch_results
    assert r["total_epochs"] >= prev_epochs + 2
    assert len(r["train_loss"]) == r["total_epochs"]


def test_resume_restores_optimizer_kind(tmp_path):
    """A checkpoint trained with SGD must resume with the SGD update rule
    even when the resuming Trainer was constructed under the default
    (adam) optimizer — the kind travels with the checkpoint (regression:
    adam_update applied to restored SGDState crashed on state.count)."""
    setting = make_setting(tmp_path, optimizer="sgd", epochs=1)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)

    setting2 = make_setting(tmp_path, epochs=1)  # optimizer defaults to adam
    model2 = build_model("lenet", setting2)
    trainer2 = Trainer(model2)
    assert trainer2.optimizer_name == "adam"
    trainer2.load_checkpoint(trainer.model_path)
    assert trainer2.optimizer_name == "sgd"
    trainer2.fit(train, valid, resume=True)  # crashes without the fix
    assert np.isfinite(trainer2.epoch_results["train_loss"][-1])


def test_evaluate_produces_metrics(fitted):
    trainer, _, _ = fitted
    _, valid = make_loaders()
    score = trainer.evaluate(valid, info=False)
    assert 0.0 <= score <= 1.0
    assert trainer.confusion_matrix.shape == (4, 4)
    assert trainer.confusion_matrix.sum() == 32
    assert "macro avg" in trainer.classification_report


def test_test_benchmark_protocol(fitted):
    trainer, _, _ = fitted
    _, valid = make_loaders()
    scores, times, fps = trainer.test(valid, num_warmup=2)
    assert fps > 0
    assert len(times) == len(valid)
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_sanity_check_mode(tmp_path):
    setting = make_setting(tmp_path, sanity_check=True, epochs=2)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)  # runs 1 batch per phase per epoch
    assert len(trainer.epoch_results["train_loss"]) == 2


def test_early_stopping(tmp_path):
    setting = make_setting(tmp_path, epochs=10, early_stop=True, es_patience=1,
                           learning_rate=0.0)  # lr=0 → no improvement ever
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)
    # stops after es_patience+1 = 2 non-improving epochs following the first
    assert trainer.epoch_results["total_epochs"] < 10


def test_plateau_rollback_changes_lr(tmp_path):
    setting = make_setting(tmp_path, epochs=5, learning_rate=1e-3,
                           lr_patience=0, lr_factor=0.5, early_stop=False)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders(n_train=32)
    trainer.fit(train, valid)
    lrs = trainer.epoch_results["learning_rate"]
    assert min(lrs) < max(lrs) or len(set(lrs)) == 1  # lr may drop


def test_batch_padding_weights():
    ds = synthetic_dataset(10, (8, 8, 3), 2, seed=0)
    loader = DataLoader(ds, 4)
    batches = list(loader)
    assert len(batches) == 3
    x, y, w = batches[-1]
    assert x.shape == (4, 8, 8, 3)
    np.testing.assert_array_equal(w, [1, 1, 0, 0])


def test_dataloader_epoch_reshuffle_determinism():
    ds = synthetic_dataset(32, (4, 4, 3), 2, seed=0)
    l1 = DataLoader(ds, 8, shuffle=True, seed=5)
    l2 = DataLoader(ds, 8, shuffle=True, seed=5)
    e1 = [y for _, y, _ in l1]
    e2 = [y for _, y, _ in l2]
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a, b)
    # second epoch differs from first
    e1b = [y for _, y, _ in l1]
    assert any(not np.array_equal(a, b) for a, b in zip(e1, e1b))


def test_debug_mode_prints_grad_norm(tmp_path, capsys):
    setting = make_setting(tmp_path, epochs=1, debug=True, sanity_check=True)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders(n_train=16, n_valid=16)
    trainer.fit(train, valid)
    out = capsys.readouterr().out
    assert "[debug] step 0:" in out and "grad_norm=" in out


def test_metrics_jsonl_written(tmp_path):
    import json, os
    setting = make_setting(tmp_path, epochs=2, sanity_check=True)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders(n_train=16, n_valid=16)
    trainer.fit(train, valid)
    path = os.path.join(str(tmp_path), f"{model.model_name}-metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["epoch"] == 1 and "valid_score" in lines[0]


def test_remat_matches_non_remat(tmp_path):
    """Remat changes memory, not math: same loss trajectory either way."""
    import numpy as np
    losses = {}
    for remat in (False, True):
        setting = make_setting(tmp_path, epochs=1, remat=remat)
        model = build_model("resnet", Settings(
            kind="18", input_size=(3, 16, 16), num_classes=4, batch_size=16,
            epochs=1, mixed_precision=False, data_augment=False,
            data_norm=False, dropout_rate=0.0, early_stop=False,
            remat=remat, output_dir=str(tmp_path)))
        trainer = Trainer(model)
        train, valid = make_loaders(n_train=32, n_valid=16)
        trainer.fit(train, valid)
        losses[remat] = trainer.epoch_results["train_loss"][0]
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-4)
