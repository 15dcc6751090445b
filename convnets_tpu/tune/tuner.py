"""Random-search hyper-parameter tuner.

Mirrors the reference Tuner (mngrtune.py:15-136): sample the Distrib space,
train a fresh model per sample, score on the validation set, keep the best
checkpoint as `<name>-<version>-tuned`, and finally reload the best state
and attach the full tuning results to its checkpoint. Data loaders are
rebuilt per sample only when a data-affecting hyper-parameter
(batch_size / data_augment / data_norm) actually varies (mngrtune.py:53-86).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from convnets_tpu.models.base import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import checkpoint as ckpt
from convnets_tpu.train.engine import Trainer
from convnets_tpu.tune.sampler import ParameterSampler

DATA_FIELDS = ("batch_size", "data_augment", "data_norm")


class Tuner:
    def __init__(self, arch: str, setting: Settings,
                 make_loaders: Callable[[Settings], tuple],
                 optimizer: Optional[str] = None, mesh=None):
        """make_loaders(setting) -> (train_loader, valid_loader); called
        once up front and again per sample iff data hyper-params vary.
        `mesh` is passed to every sample's Trainer so tuned samples train
        sharded over the same device mesh as regular fits (and the mesh is
        built once, not per sample)."""
        self.arch = arch
        self.setting = setting
        self.make_loaders = make_loaders
        self.optimizer = optimizer or getattr(setting, "optimizer", "adam")
        self.mesh = mesh
        self.version = int(time.time())
        self.best_score = -float("inf")
        self.best_path: Optional[str] = None
        self.results = {"samples": [], "scores": [], "best_index": -1}

    def _data_varies(self) -> bool:
        d = self.setting.distrib.to_dict()
        return any(
            (hasattr(d[f], "rvs") or len(set(map(str, d[f]))) > 1)
            for f in DATA_FIELDS if f in d and d[f] is not None
        )

    def tuned_path(self) -> str:
        name = self.arch + str(self.setting.kind)
        return ckpt.checkpoint_path(
            self.setting.output_dir, name, self.version, ckpt.SUFFIX_TUNED
        )

    def process(self, num_iter: int):
        sampler = ParameterSampler(
            self.setting.distrib.to_dict(), num_iter, seed=self.setting.seed
        )
        data_varies = self._data_varies()
        trainset, validset = self.make_loaders(self.setting)
        best_trainer = None

        for i, sample in enumerate(sampler):
            print(f"\n=== TUNING SAMPLE {i + 1}/{num_iter} ===\n{sample}")
            self.setting.load_values(sample)
            if data_varies:
                trainset, validset = self.make_loaders(self.setting)

            model = build_model(self.arch, self.setting)
            trainer = Trainer(model, optimizer=self.optimizer, mesh=self.mesh)
            trainer.fit(trainset, validset)
            score = trainer.evaluate(validset, info=False)

            self.results["samples"].append(dict(sample))
            self.results["scores"].append(float(score))
            if score > self.best_score:
                self.best_score = float(score)
                self.results["best_index"] = i
                best_trainer = trainer
                self.best_path = trainer.save_checkpoint(self.tuned_path())
                print(f"New best score {score:.4f} → {self.best_path}")

        if best_trainer is not None:
            # reload best and attach tuning results (mngrtune.py:113-122)
            meta = best_trainer.load_checkpoint(self.best_path)
            best_trainer.epoch_results = meta["epoch_results"]
            ckpt_meta_extra = {"tuning_results": self.results}
            ckpt.save_checkpoint(
                self.best_path,
                params=best_trainer.state.params,
                model_state=best_trainer.state.model_state,
                opt_state=best_trainer.state.opt_state,
                lr=best_trainer.state.lr,
                loss_scale=best_trainer.state.loss_scale,
                epoch_results=best_trainer.epoch_results,
                settings_dict=self.setting.to_dict(),
                scheduler_state=best_trainer.scheduler.to_state()
                if best_trainer.scheduler else {},
                optimizer_name=self.optimizer,
                extra=ckpt_meta_extra,
            )
        return best_trainer, self.results

    def process_cv(self, *a, **kw):
        raise NotImplementedError("cross-validation tuning (parity: mngrtune.py:130-136)")
