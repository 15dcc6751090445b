"""Random-search hyper-parameter tuning on real CINIC-10 (single chip).

Exercises the full reference tuning workflow (mngrtune.py:35-128) at TPU
speed: N samples from a Distrib space over lr / weight-decay / dropout,
each trained for a short budget with the device-resident input path, the
winner kept as a `-tuned` checkpoint with tuning_results attached, and the
hyperparameter-vs-score scatter grid rendered (mngrplot.py:207-295).

Usage:
  python scripts/tune_cinic.py --arch resnet --kind 18 --samples 8 --epochs 15
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--kind", default="18")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--data-root", default=CINIC_ROOT)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.settings import HyperParamsDistrib, LogUniform, Settings, Uniform
    from convnets_tpu.tune import Tuner
    from convnets_tpu.viz import PlotMngr

    distrib = HyperParamsDistrib(
        learning_rate=LogUniform(0.02, 0.5),
        weight_decay=LogUniform(1e-5, 1e-3),
        dropout_rate=Uniform(0.0, 0.3),
        batch_size=[args.batch],
        epochs=[args.epochs],
        data_augment=[True],
        data_norm=[True],
        early_stop=[False],
        loss_optim=[False],
    )
    setting = Settings(
        kind=args.kind, input_size=(3, 32, 32), num_classes=10,
        batch_size=args.batch, epochs=args.epochs,
        optimizer="sgd", momentum=0.9, lr_scheduler="cosine",
        lr_warmup_epochs=2, data_augment=True, augment_affine=False,
        data_norm=True, loss_reduction="mean", early_stop=False,
        mixed_precision=True, output_dir=args.out, distrib=distrib,
    )

    data = DataMngr(setting, root=args.data_root)

    def make_loaders(s):
        data.batch_size = s.batch_size
        return data.load_train(), data.load_valid()

    tuner = Tuner(args.arch, setting, make_loaders)
    best_trainer, results = tuner.process(args.samples)

    record = {
        "arch": args.arch, "kind": args.kind, "samples": args.samples,
        "epochs_per_sample": args.epochs,
        "best_score": tuner.best_score,
        "best_sample": results["samples"][results["best_index"]]
        if results["best_index"] >= 0 else None,
        "scores": results["scores"],
        "checkpoint": tuner.best_path,
    }
    path = os.path.join(args.out, f"TUNE-cinic-{args.arch}-{args.kind}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))

    plots = PlotMngr(output_dir=os.path.join(args.out, "plots"))
    path = plots.hyperparameters(
        results, ("learning_rate", "weight_decay", "dropout_rate"),
        name=f"tune_{args.arch}{args.kind}_hyperparameters.png",
    )
    print("plots:", path)


if __name__ == "__main__":
    main()
