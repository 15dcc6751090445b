"""Data-order checkpointing (VERDICT r3 #6) + reproducible test() order
(weak #7) + per-layer debug tracing (weak #6).

The contract under test: a fit() interrupted after epoch B and resumed
from its checkpoint replays epochs B+1.. with the SAME shuffled
permutations, the SAME per-epoch dropout/augment keys and the SAME
scheduler trajectory as the uninterrupted run — bit-for-bit on CPU.
Reference slot: basemodel.py:374-393 resume path (which does NOT
checkpoint torch DataLoader order; we deliberately do better)."""

import numpy as np
import jax
import pytest

from convnets_tpu.data import DataLoader, synthetic_dataset
from convnets_tpu.data.loader import DeviceCacheLoader
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import Trainer
from convnets_tpu.train import checkpoint as ckpt


def make_setting(tmp_path, **kw):
    kw.setdefault("batch_size", 16)
    kw.setdefault("learning_rate", 2e-3)
    kw.setdefault("mixed_precision", False)
    kw.setdefault("data_augment", False)
    kw.setdefault("data_norm", False)
    kw.setdefault("early_stop", False)
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("loss_optim", True)  # valid-loss improvement gating
    kw.setdefault("output_dir", str(tmp_path))
    return Settings(kind=0, input_size=(3, 16, 16), num_classes=4, **kw)


def make_loaders(loader_cls, batch=16):
    # valid == train data: memorization makes valid loss improve every
    # epoch, so the bit-equivalence fixture's checkpoint is always the
    # LAST epoch's (monotone improvement — asserted below)
    train_ds = synthetic_dataset(64, (16, 16, 3), 4, seed=0)
    valid_ds = synthetic_dataset(64, (16, 16, 3), 4, seed=0)
    train = loader_cls(train_ds, batch, shuffle=True, seed=0)
    valid = loader_cls(valid_ds, batch, shuffle=False)
    return train, valid


def params_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def run_uninterrupted(tmp_path, epochs, loader_cls):
    setting = make_setting(tmp_path, epochs=epochs)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    train, valid = make_loaders(loader_cls)
    trainer.fit(train, valid)
    trainer.close()
    return trainer


def run_split(tmp_path, first, second, loader_cls):
    setting = make_setting(tmp_path, epochs=first)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    train, valid = make_loaders(loader_cls)
    trainer.fit(train, valid)
    trainer.close()

    # fresh process analogue: new trainer, new loaders (epoch clocks at 0)
    setting2 = make_setting(tmp_path, epochs=second)
    model2 = build_model("lenet", setting2)
    trainer2 = Trainer(model2, optimizer="sgd")
    trainer2.load_checkpoint(trainer.model_path)
    trainer2.setting.epochs = second
    train2, valid2 = make_loaders(loader_cls)
    trainer2.fit(train2, valid2, resume=True)
    trainer2.close()
    return trainer2, train2


@pytest.mark.parametrize("loader_cls", [DataLoader, DeviceCacheLoader],
                         ids=["host-loader", "device-cache-scan"])
def test_resume_is_bit_identical_to_uninterrupted(tmp_path, loader_cls):
    ta = run_uninterrupted(tmp_path / "a", 4, loader_cls)
    # the equivalence statement requires the checkpoint to be the LAST
    # epoch's (monotone improvement) — holds for this seed/recipe
    assert ta.epoch_results["train_epochs"] == 4, \
        "fixture drift: last epoch must be the best"

    tb, train2 = run_split(tmp_path / "b", 2, 2, loader_cls)
    assert tb.epoch_results["train_epochs"] == 4

    # resumed loaders were rewound to the checkpointed epoch clock (2)
    # and then served 2 more epochs
    assert train2.epoch == 4

    # merged history identical: resumed epochs 3-4 saw the same
    # permutations, dropout keys and scheduler lr as the uninterrupted run
    for k in ("train_loss", "valid_loss", "train_score", "valid_score",
              "learning_rate"):
        assert ta.epoch_results[k] == tb.epoch_results[k], k

    # final best-checkpoint params bit-identical
    trees_a, _ = ckpt.load_checkpoint(ta.model_path)
    trees_b, _ = ckpt.load_checkpoint(tb.model_path)
    assert params_equal(trees_a["params"], trees_b["params"])
    assert params_equal(trees_a["opt_state"], trees_b["opt_state"])


def test_checkpoint_meta_carries_loader_epochs(tmp_path):
    trainer = run_uninterrupted(tmp_path, 2, DataLoader)
    _, meta = ckpt.load_checkpoint(trainer.model_path)
    le = meta["extra"]["loader_epochs"]
    assert le == {"train": 2, "valid": 2}


def test_manual_save_has_no_loader_epochs(tmp_path):
    setting = make_setting(tmp_path, epochs=1)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    trainer.init_state()
    trainer.init_optimizer()
    path = trainer.save_checkpoint(str(tmp_path / "manual.ckpt.npz"))
    _, meta = ckpt.load_checkpoint(path)
    assert "loader_epochs" not in meta["extra"]


def test_test_order_repins_loader_epoch(tmp_path):
    """test() resets the loader's epoch clock (the reference re-seeds via
    set_reproducible_mode before its timed loop, basemodel.py:650-651), so
    the subset accuracy samples do not depend on prior loader use."""
    setting = make_setting(tmp_path, epochs=1, test_sample_size=4)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    train, valid = make_loaders(DataLoader)
    trainer.fit(train, valid)

    test_loader = DataLoader(synthetic_dataset(48, (16, 16, 3), 4, seed=2),
                             16, shuffle=True, seed=0)
    scores1, _, _ = trainer.test(test_loader, num_warmup=1)
    for _ in test_loader:  # disturb the epoch clock between calls
        pass
    scores2, _, _ = trainer.test(test_loader, num_warmup=0)
    trainer.close()
    assert scores1 == scores2


def test_debug_trace_prints_every_layer(tmp_path, capsys):
    setting = make_setting(tmp_path, epochs=1)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    trainer.init_state()
    trainer.init_optimizer()
    trainer.debug_trace()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("[trace]")]
    # every leaf module reports shape + stats; lenet has conv/pool/fc depth
    assert len(lines) >= 5
    assert "mean=" in lines[0] and "std=" in lines[0]
    # scoped: the wrapper is gone afterwards (class apply restored)
    assert "apply" not in trainer.model.module.__dict__


def test_debug_fit_traces_once(tmp_path, capsys):
    setting = make_setting(tmp_path, epochs=1, debug=True, sanity_check=True)
    model = build_model("lenet", setting)
    trainer = Trainer(model, optimizer="sgd")
    train, valid = make_loaders(DataLoader)
    trainer.fit(train, valid)
    trainer.close()
    out = capsys.readouterr().out
    assert "[trace]" in out            # per-layer activation trace ran
    assert "total params" in out       # summary table printed
