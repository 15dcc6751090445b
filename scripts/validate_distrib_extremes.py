"""Validate the default Distrib space's extremes actually run on TPU.

HyperParamsDistrib's default batch-size list spans 2…512
(settings.py DEF_BATCH_SIZE; reference settings.py:66-166). Nothing in the
accuracy campaign exercises the ends of that range, so this script runs a
short real-data train+valid epoch at each extreme (and the biggest batch)
on the chip — the proof that a tuner sample drawn from the default space
cannot hit an unrunnable configuration (r2 VERDICT weak #8).

Usage: python scripts/validate_distrib_extremes.py
Writes data/output/distrib_extremes.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from convnets_tpu.data.loader import DataLoader, DeviceCacheLoader
    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import HyperParamsDistrib, Settings
    from convnets_tpu.train.engine import Trainer

    print("platform:", jax.devices()[0].platform, flush=True)
    lo = min(HyperParamsDistrib.DEF_BATCH_SIZE)
    hi = max(HyperParamsDistrib.DEF_BATCH_SIZE)
    results = {"space_batch_sizes": HyperParamsDistrib.DEF_BATCH_SIZE}

    for batch, steps in ((lo, 50), (hi, None)):
        setting = Settings(
            kind="18", input_size=(3, 32, 32), num_classes=10,
            batch_size=batch, epochs=1, optimizer="sgd", momentum=0.9,
            # tiny lr: the check is "the config compiles and executes with
            # finite loss", and batch-2 BN statistics diverge at real lrs
            lr_scheduler="none", learning_rate=1e-3, data_augment=True,
            augment_affine=False, data_norm=True, loss_reduction="mean",
            mixed_precision=True, early_stop=False,
            output_dir="/tmp/extremes_out",
        )
        data = DataMngr(setting, root="/root/reference/data/CINIC-10")
        trainset = data.load_train()
        n_seen = trainset._host_count()
        if steps is not None and isinstance(trainset, DeviceCacheLoader):
            # batch 2 over 90k images = 45k scanned steps — cap the epoch
            # to `steps` batches by sub-slicing the index matrices (the
            # point is "it runs", not a full epoch)
            def truncated(self=trainset, _orig=type(trainset).epoch_matrices):
                idx, w = _orig(self)
                return idx[:steps], w[:steps]

            trainset.epoch_matrices = truncated
            n_seen = steps * batch
        trainer = Trainer(build_model("resnet", setting))
        trainer.init_state()
        t0 = time.perf_counter()
        loss, score = trainer._run_train_epoch(trainset, 0)
        dt = time.perf_counter() - t0
        n_steps = steps if steps is not None else len(trainset)
        # _run_train_epoch divides by the FULL host count; rescale the
        # per-example loss to the examples this (possibly truncated)
        # epoch actually saw
        loss = float(loss) * trainer._loader_host_count(trainset) / n_seen
        results[f"batch_{batch}"] = {
            "steps": int(n_steps), "mean_loss": round(loss, 4),
            "wall_s": round(dt, 1), "ok": bool(np.isfinite(loss)),
        }
        print(f"batch {batch}: {n_steps} steps in {dt:.1f}s, "
              f"mean loss {loss:.4f} OK", flush=True)

    os.makedirs("data/output", exist_ok=True)
    with open("data/output/distrib_extremes.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
