"""Tuner tests: sampler determinism, random search keeps the best
checkpoint with tuning results attached (reference mngrtune.py:35-128)."""

import numpy as np
import pytest

from convnets_tpu.data import DataLoader, synthetic_dataset
from convnets_tpu.settings import HyperParamsDistrib, Settings, LogUniform
from convnets_tpu.train import checkpoint as ckpt
from convnets_tpu.tune import ParameterSampler, Tuner


def test_sampler_deterministic_and_typed():
    dists = {
        "batch_size": [8, 16, 32],
        "learning_rate": LogUniform(1e-4, 1e-1),
        "batch_norm": [False, True],
    }
    s1 = list(ParameterSampler(dists, 5, seed=3))
    s2 = list(ParameterSampler(dists, 5, seed=3))
    assert s1 == s2
    assert len(s1) == 5
    for s in s1:
        assert s["batch_size"] in (8, 16, 32)
        assert 1e-4 <= s["learning_rate"] <= 1e-1
    # different seeds differ
    s3 = list(ParameterSampler(dists, 5, seed=4))
    assert s1 != s3


def test_tuner_process_keeps_best(tmp_path):
    distrib = HyperParamsDistrib(
        batch_size=[16],
        batch_norm=[True],
        epochs=[1],
        learning_rate=LogUniform(1e-4, 1e-2),
        lr_factor=[0.1],
        lr_patience=[5],
        weight_decay=[0.0],
        dropout_rate=[0.0],
        loss_optim=[False],
        data_augment=[False],
        data_norm=[False],
        early_stop=[False],
        es_patience=[10],
        grad_clip_norm=[False],
        gc_max_norm=[1.0],
        grad_clip_value=[False],
        gc_value=[1.0],
        init_params=[True],
    )
    setting = Settings(
        kind=0, input_size=(3, 16, 16), num_classes=3, batch_size=16, epochs=1,
        mixed_precision=False, data_augment=False, data_norm=False,
        dropout_rate=0.0, early_stop=False, distrib=distrib,
        output_dir=str(tmp_path),
    )

    def make_loaders(s):
        train = DataLoader(synthetic_dataset(32, (16, 16, 3), 3, seed=0),
                           s.batch_size, shuffle=True, seed=0)
        valid = DataLoader(synthetic_dataset(16, (16, 16, 3), 3, seed=1),
                           s.batch_size)
        return train, valid

    tuner = Tuner("lenet", setting, make_loaders)
    best_trainer, results = tuner.process(num_iter=2)

    assert len(results["samples"]) == 2
    assert len(results["scores"]) == 2
    assert 0 <= results["best_index"] < 2
    assert best_trainer is not None
    assert tuner.best_path and tuner.best_path.endswith(
        ckpt.SUFFIX_TUNED + ckpt.EXT
    )
    # best checkpoint carries the tuning results (mngrtune.py:113-122)
    _, meta = ckpt.load_checkpoint(tuner.best_path)
    assert meta["extra"]["tuning_results"]["scores"] == results["scores"]


def test_tuner_cv_not_implemented(tmp_path):
    setting = Settings(kind=0, input_size=(3, 16, 16), num_classes=3,
                       output_dir=str(tmp_path))
    tuner = Tuner("lenet", setting, lambda s: (None, None))
    with pytest.raises(NotImplementedError):
        tuner.process_cv()
