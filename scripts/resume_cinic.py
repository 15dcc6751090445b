"""Resume a CINIC campaign checkpoint for N more epochs, then run the
timed test protocol and write/refresh its RESULT json.

The reference process_load(resume=True) path (template_net.py:201-261):
full state (params/optimizer/scheduler/history) restores from the best
checkpoint, history truncates to the best epoch, and training continues
where the cosine schedule left off — used to finish a run that was
interrupted mid-schedule.

Usage:
  python scripts/resume_cinic.py --checkpoint data/output/X.ckpt.npz \
      --arch shufflenet_v1 --epochs-more 15 --results data/output/R.json
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--arch", required=True)
    ap.add_argument("--kind", default=None)
    ap.add_argument("--epochs-more", type=int, default=15)
    ap.add_argument("--results", required=True)
    ap.add_argument("--data-root", default=CINIC_ROOT)
    ap.add_argument("--tag", default="r2")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train import checkpoint as ckpt
    from convnets_tpu.train.engine import Trainer

    _, meta = ckpt.load_checkpoint(args.checkpoint)
    kind = args.kind or meta["settings"]["kind"]
    setting = Settings(kind=kind, input_size=(3, 32, 32), num_classes=10,
                       batch_size=256, mixed_precision=True,
                       data_augment=True, augment_affine=False,
                       data_norm=True, loss_reduction="mean",
                       early_stop=False, output_dir="data/output")
    model = build_model(args.arch, setting)
    trainer = Trainer(model)
    trainer.model_path = args.checkpoint
    trainer.load_checkpoint(args.checkpoint)
    # load_checkpoint re-applies saved hparams onto the live Settings
    # (reference semantics) — override the continuation budget AFTER it
    setting.epochs = args.epochs_more
    setting.early_stop = False
    setting.data_augment = True

    data = DataMngr(setting, root=args.data_root)
    trainset = data.load_train()
    validset = data.load_valid()
    print(f"== resume {model.model_name} from {args.checkpoint}: "
          f"+{args.epochs_more} epochs (scheduler epoch "
          f"{trainer.scheduler.to_state().get('epoch')}) ==", flush=True)

    t0 = time.time()
    trainer.fit(trainset, validset, resume=True)
    train_min = (time.time() - t0) / 60.0

    trainer.load_checkpoint(trainer.model_path)
    testset = data.load_test()
    scores, times, fps = trainer.test(testset)
    cm = np.asarray(trainer.confusion_matrix)
    test_top1 = float(np.trace(cm)) / float(cm.sum()) * 100.0

    record = {
        "config": model.model_name,
        "dataset": "CINIC-10",
        "tag": args.tag,
        "epochs_requested": meta["settings"].get("epochs"),
        "epochs_ran": trainer.epoch_results["total_epochs"],
        "best_epoch": trainer.epoch_results["train_epochs"],
        "train_time_min": round(train_min, 2),
        "test_top1_pct": round(test_top1, 2),
        "test_throughput_img_s": round(float(fps), 1),
        "checkpoint": trainer.model_path,
        "resumed": True,
        "hparams": {k: meta["settings"].get(k) for k in
                    ("learning_rate", "weight_decay", "batch_size",
                     "optimizer", "momentum", "lr_scheduler")},
    }
    os.makedirs(os.path.dirname(args.results) or ".", exist_ok=True)
    with open(args.results, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {args.results}", flush=True)


if __name__ == "__main__":
    main()
