"""Train one reference config to accuracy parity on CINIC-10 (single chip).

The round-2 recipe (VERDICT r1 next-steps #3): SGD + momentum, cosine decay
with warmup, crop+flip-only augmentation (augment_affine=False), long
schedule — replacing round 1's noisy Adam-plateau run. The engine already
does best-checkpoint gating on valid accuracy; after fit() we reload the
best checkpoint and run the timed test protocol on the test split.

Usage:
  python scripts/train_cinic.py --arch resnet --kind 26 --epochs 120 \
      --lr 0.2 --warmup 5 --out data/output --tag r2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--kind", default="26")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--lr-min", type=float, default=1e-5)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--wd", type=float, default=5e-4)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--nesterov", action="store_true")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--label-smoothing", type=float, default=0.0)
    ap.add_argument("--mixup", type=float, default=0.0,
                    help="mixup Beta(a,a) alpha (0 = off) - r5 MobileNet probe")
    ap.add_argument("--reference-recipe", action="store_true",
                    help="faithful reference recipe (r4 VERDICT #4b): Adam "
                         "lr 0.01 + ReduceLROnPlateau(0.1, patience 10), "
                         "wd 1e-4, dropout 0.5, affine augment, sum-CE, "
                         "early-stop patience 12 (reference settings.py "
                         "DEF_* + basemodel.py:58-83)")
    ap.add_argument("--affine", action="store_true",
                    help="use the full reference augmentation (affine) too")
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--data-root", default=CINIC_ROOT)
    ap.add_argument("--tag", default="r2")
    ap.add_argument("--seed", type=int, default=None,
                    help="override Settings.seed (reproducibility sweeps)")
    ap.add_argument("--results", default=None,
                    help="path for the run-results JSON")
    ap.add_argument("--cpu", action="store_true", help="force CPU (smoke)")
    ap.add_argument("--sanity", action="store_true",
                    help="sanity_check mode: one batch per loop")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    if args.reference_recipe:
        setting = Settings(
            kind=args.kind, input_size=(3, 32, 32), num_classes=10,
            batch_size=args.batch, epochs=args.epochs,
            learning_rate=0.01, lr_factor=0.1, lr_patience=10,
            weight_decay=1e-4, dropout_rate=0.5,
            optimizer="adam", lr_scheduler="plateau",
            data_augment=True, augment_affine=True, data_norm=True,
            loss_reduction="sum", early_stop=True, es_patience=12,
            loss_optim=False, mixed_precision=True, output_dir=args.out,
            sanity_check=bool(args.sanity),
            **({"seed": args.seed} if args.seed is not None else {}),
        )
    else:
        setting = Settings(
            kind=args.kind, input_size=(3, 32, 32), num_classes=10,
            batch_size=args.batch, epochs=args.epochs,
            learning_rate=args.lr, weight_decay=args.wd,
            dropout_rate=args.dropout,
            optimizer="sgd", momentum=args.momentum, nesterov=args.nesterov,
            lr_scheduler="cosine", lr_min=args.lr_min,
            lr_warmup_epochs=args.warmup,
            data_augment=True, augment_affine=bool(args.affine), data_norm=True,
            loss_reduction="mean",  # standard SGD lr/wd scale
            label_smoothing=args.label_smoothing,
            mixup=args.mixup,
            early_stop=False, loss_optim=False,
            mixed_precision=True, output_dir=args.out,
            sanity_check=bool(args.sanity),
            **({"seed": args.seed} if args.seed is not None else {}),
        )

    data = DataMngr(setting, root=args.data_root)
    trainset = data.load_train()
    validset = data.load_valid()

    model = build_model(args.arch, setting)
    trainer = Trainer(model)
    if args.reference_recipe:
        print(f"== {model.model_name} v{model.version} :: REFERENCE recipe "
              f"adam lr=0.01 plateau(0.1,10) wd=1e-4 dropout=0.5 sum-CE "
              f"affine-augment es=12 epochs={args.epochs} seed={setting.seed} ==",
              flush=True)
    else:
        print(f"== {model.model_name} v{model.version} :: "
              f"sgd lr={args.lr} cosine({args.epochs}ep, warmup {args.warmup}) "
              f"wd={args.wd} batch={args.batch} mixup={args.mixup} "
              f"augment={'crop+flip+affine' if args.affine else 'crop+flip'} ==",
              flush=True)

    t0 = time.time()
    trainer.fit(trainset, validset)
    train_min = (time.time() - t0) / 60.0

    # reload the best checkpoint, then timed test-split protocol
    trainer.load_checkpoint(trainer.model_path)
    testset = data.load_test()
    scores, times, fps = trainer.test(testset)
    import numpy as np
    cm = np.asarray(trainer.confusion_matrix)
    test_top1 = float(np.trace(cm)) / float(cm.sum()) * 100.0

    record = {
        "config": model.model_name,
        "dataset": "CINIC-10",
        "tag": args.tag,
        "epochs_requested": args.epochs,
        "epochs_ran": trainer.epoch_results["total_epochs"],
        "best_epoch": trainer.epoch_results["train_epochs"],
        "train_time_min": round(train_min, 2),
        "test_top1_pct": round(test_top1, 2),
        "test_throughput_img_s": round(float(fps), 1),
        "checkpoint": trainer.model_path,
        "hparams": {
            "lr": 0.01, "optimizer": "adam", "scheduler": "plateau",
            "weight_decay": 1e-4, "dropout": 0.5, "loss_reduction": "sum",
            "batch": args.batch, "epochs": args.epochs,
            "augment": "crop+flip+affine", "early_stop": 12,
            "reference_recipe": True, "mixed_precision": True,
        } if args.reference_recipe else {
            "lr": args.lr, "lr_min": args.lr_min, "warmup": args.warmup,
            "batch": args.batch, "optimizer": "sgd",
            "momentum": args.momentum, "nesterov": args.nesterov,
            "weight_decay": args.wd, "dropout": args.dropout,
            "scheduler": "cosine", "epochs": args.epochs,
            "label_smoothing": args.label_smoothing,
            "mixup": args.mixup,
            "augment": "crop+flip+affine" if args.affine else "crop+flip",
            "mixed_precision": True,
            "reference_recipe": False,
        },
    }
    path = args.results or os.path.join(
        args.out, f"RESULT-{model.model_name}-{args.tag}.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {path}", flush=True)


if __name__ == "__main__":
    main()
