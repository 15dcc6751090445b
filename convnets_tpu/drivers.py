"""Experiment drivers — the reference's L5 entry surface
(the process_fit / process_tune / process_load / process_eval quartet that
closes every model file; canonical copy template_net.py:69-261), rebuilt as
reusable functions over the TPU stack and exposed through the CLI
(``python -m convnets_tpu``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from convnets_tpu.data.manager import DataMngr
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train.engine import Trainer
from convnets_tpu.tune.tuner import Tuner
from convnets_tpu.viz.plots import PlotMngr


def _loaders(setting: Settings, data_root: Optional[str]):
    data = DataMngr(setting, root=data_root)
    return data, data.load_train(), data.load_valid()


def process_eval(trainer: Trainer, trainset, validset, testset,
                 tuning: bool = False, results: Optional[dict] = None,
                 plot_dir: Optional[str] = None):
    """Evaluate on train/valid, timed test on test, render all plots
    (reference template_net.py:69-93)."""
    if plot_dir is None:
        plot_dir = os.path.join(trainer.setting.output_dir, "plots")
    plot = PlotMngr(plot_dir)
    if trainer.epoch_results and trainer.epoch_results.get("train_loss"):
        plot.performance(trainer.epoch_results)

    trainer.evaluate(trainset)
    plot.confusion_matrix(trainer.confusion_matrix, trainer.class_names,
                          name="confusion_train.png")
    trainer.evaluate(validset)
    plot.confusion_matrix(trainer.confusion_matrix, trainer.class_names,
                          name="confusion_valid.png")
    scores, times, fps = trainer.test(testset)
    plot.confusion_matrix(trainer.confusion_matrix, trainer.class_names,
                          name="confusion_test.png")

    if tuning and results:
        if "tuning_results" in results:
            results = results["tuning_results"]
        if results.get("samples"):
            plot.hyperparameters(results, trainer.setting.get_hparams_names())
    return scores, times, fps


def process_fit(arch: str, setting: Settings,
                data_root: Optional[str] = None,
                optimizer: Optional[str] = None) -> Trainer:
    """Train a fresh model end-to-end, then evaluate
    (reference template_net.py:96-156)."""
    data, trainset, validset = _loaders(setting, data_root)
    model = build_model(arch, setting)
    trainer = Trainer(model, optimizer=optimizer)
    trainer.print_summary()
    trainer.fit(trainset, validset)
    testset = data.load_test()
    process_eval(trainer, trainset, validset, testset)
    return trainer


def process_tune(arch: str, setting: Settings, num_iter: int,
                 data_root: Optional[str] = None,
                 optimizer: Optional[str] = None) -> Tuple[Trainer, dict]:
    """Random-search over setting.distrib, evaluate the winner
    (reference template_net.py:158-219)."""
    def make_loaders(s):
        data = DataMngr(s, root=data_root)
        return data.load_train(), data.load_valid()

    tuner = Tuner(arch, setting, make_loaders, optimizer=optimizer)
    trainer, results = tuner.process(num_iter=num_iter)
    if trainer is not None:
        data = DataMngr(trainer.setting, root=data_root)
        process_eval(trainer, data.load_train(), data.load_valid(),
                     data.load_test(), tuning=True,
                     results={"tuning_results": results})
    return trainer, results


def process_load(arch: str, setting: Settings, path: Optional[str] = None,
                 resume_training: bool = False, epochs: Optional[int] = None,
                 data_root: Optional[str] = None, testing: bool = False,
                 optimizer: Optional[str] = None):
    """Load a checkpoint; optionally resume training; evaluate
    (reference template_net.py:221-261). With testing=True returns
    (model_name, subset_scores) for cross-model comparison
    (mngrutility.py:61-114)."""
    model = build_model(arch, setting)
    trainer = Trainer(model, optimizer=optimizer)
    meta = trainer.load_checkpoint(path)
    trainer.setting.show()

    data = DataMngr(trainer.setting, root=data_root)
    if resume_training:
        if epochs is not None:
            trainer.setting.epochs = epochs
        trainer.fit(data.load_train(), data.load_valid(), resume=True)

    if testing:
        scores, _, _ = trainer.test(data.load_test())
        return trainer.model.model_name, scores

    scores, times, fps = process_eval(
        trainer, data.load_train(), data.load_valid(), data.load_test(),
        tuning=True, results=meta.get("extra", {}),
    )
    return trainer, meta


def process_export(arch: str, setting: Settings, out_path: str,
                   ckpt_path: Optional[str] = None,
                   serve_batch: Optional[int] = None,
                   output: str = "logits",
                   bake_norm: bool = False,
                   data_root: Optional[str] = None,
                   platforms: Optional[Tuple[str, ...]] = None) -> dict:
    """Load a checkpoint and write a standalone AOT serving artifact
    (convnets_tpu.serve) — the deployment step the reference stops short
    of (its serving story is checkpoint reload inside the training
    process, template_net.py:221-261). With bake_norm=True the dataset's
    per-channel normalization (reference mngrdata.py:61-72, applied
    host-side there) is compiled into the graph and served requests send
    raw [0,1] pixels."""
    from convnets_tpu.serve import export_trainer

    model = build_model(arch, setting)
    trainer = Trainer(model)
    trainer.load_checkpoint(ckpt_path)

    stats = None
    class_names = None
    if bake_norm or data_root is not None:
        data = DataMngr(trainer.setting, root=data_root)
        ds = data.load_train().dataset
        if bake_norm:
            stats = (ds.mean, ds.std)
        class_names = getattr(ds, "class_names", None)

    kwargs = {} if platforms is None else {"platforms": platforms}
    meta = export_trainer(trainer, out_path, batch_size=serve_batch,
                          output=output, stats=stats,
                          class_names=class_names, **kwargs)
    print(f"exported {meta['model_name']} -> {out_path} "
          f"(batch={meta['batch']}, output={meta['output']}, "
          f"platforms={','.join(meta['platforms'])})")
    return meta
