"""224-input real-data rehearsal — the BASELINE.json config #3 shape
(ResNet-18/50, step-decay LR, ImageNet-style 224 pipeline) exercised
end-to-end on real PNGs (r2 VERDICT next-steps #8).

ImageNet itself is not on disk (zero-egress env), so this builds the same
pipeline from the bundled CINIC-10 PNGs: a class-balanced subset symlink
tree, decoded at 256×256 (ImageFolderDataset's resize-on-decode), streamed
through the host DataLoader, RandomResizedCrop→224 + hflip on device in
the train jit, Resize+CenterCrop eval path, step-decay schedule. Records
pipeline-attached img/s at 224 alongside the accuracy curve.

Usage: python scripts/rehearsal224.py --arch resnet --kind 18 \
    --per-class 1000 --epochs 3
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def build_subset(src_root, dst_root, split, per_class, seed=0):
    """Class-balanced symlink tree of `per_class` PNGs per class."""
    src = os.path.join(src_root, split)
    dst = os.path.join(dst_root, split)
    if os.path.isdir(dst):
        return dst
    rng = random.Random(seed)
    for cname in sorted(os.listdir(src)):
        cdir = os.path.join(src, cname)
        if not os.path.isdir(cdir):
            continue
        files = sorted(os.listdir(cdir))
        rng.shuffle(files)
        os.makedirs(os.path.join(dst, cname), exist_ok=True)
        for fname in files[:per_class]:
            link = os.path.join(dst, cname, fname)
            if not os.path.exists(link):
                os.symlink(os.path.join(cdir, fname), link)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--kind", default="18")
    ap.add_argument("--per-class", type=int, default=1000)
    ap.add_argument("--valid-per-class", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--lr-step", type=int, default=2)
    ap.add_argument("--decode", type=int, default=256,
                    help="decode size; train crops to 224, eval center-crops")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--resident", action="store_true",
                    help="push the decoded subset to HBM (DeviceCacheLoader"
                         " + whole-epoch scan) instead of host streaming —"
                         " the 256-decoded 12k-image subset is ~2.4 GB uint8,"
                         " well under one chip's HBM")
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--tag", default="r3")
    ap.add_argument("--subset-root", default=os.path.join("data", "rehearsal224"),
                    help="symlink-tree location; use a distinct root per "
                         "--per-class size (an existing tree is reused as-is)")
    args = ap.parse_args()

    root = args.subset_root
    train_dir = build_subset(CINIC_ROOT, root, "train", args.per_class)
    valid_dir = build_subset(CINIC_ROOT, root, "valid", args.valid_per_class)

    from convnets_tpu.data.datasets import ImageFolderDataset
    from convnets_tpu.data.loader import DataLoader
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=args.kind, input_size=(3, 224, 224), num_classes=10,
        batch_size=args.batch, epochs=args.epochs,
        learning_rate=args.lr, weight_decay=1e-4, dropout_rate=0.0,
        optimizer="sgd", momentum=0.9,
        lr_scheduler="step", lr_step_size=args.lr_step, lr_factor=0.1,
        data_augment=True, data_norm=True,
        loss_reduction="mean", early_stop=False, loss_optim=False,
        mixed_precision=True, output_dir=args.out,
        device_cache=False,  # 224-class data streams through the host path
    )

    dec = (args.decode, args.decode)
    cache_dir = os.path.join("data", "cache")
    train_ds = ImageFolderDataset(
        train_dir, image_size=dec,
        disk_cache=os.path.join(
            cache_dir,
            f"rehearsal224-train-{args.per_class}x{args.decode}.npy"))
    valid_ds = ImageFolderDataset(
        valid_dir, image_size=dec,
        disk_cache=os.path.join(
            cache_dir,
            f"rehearsal224-valid-{args.valid_per_class}x{args.decode}.npy"))
    if args.resident:
        from convnets_tpu.data.loader import DeviceCacheLoader

        trainset = DeviceCacheLoader(train_ds, args.batch, shuffle=True,
                                     seed=setting.seed)
        validset = DeviceCacheLoader(valid_ds, args.batch)
    else:
        trainset = DataLoader(train_ds, args.batch, shuffle=True,
                              seed=setting.seed, num_workers=args.workers)
        validset = DataLoader(valid_ds, args.batch, num_workers=args.workers)
    trainset.augment, trainset.normalize = True, True
    validset.augment, validset.normalize = False, True

    model = build_model(args.arch, setting)
    trainer = Trainer(model)
    print(f"== 224 rehearsal: {model.model_name} decode={args.decode} "
          f"train={len(train_ds)} valid={len(valid_ds)} step-decay "
          f"lr={args.lr}/{args.lr_step}ep ==", flush=True)

    epoch_times = []
    orig_hook = None

    def hook(tr, epoch):
        epoch_times.append(time.perf_counter())

    trainer.epoch_hook = hook
    t0 = time.perf_counter()
    trainer.fit(trainset, validset)
    total = time.perf_counter() - t0

    # steady-state pipeline throughput: last epoch wall time (first epoch
    # pays the decode of the whole subset into the RAM cache + compiles)
    marks = [t0] + epoch_times
    per_epoch = [b - a for a, b in zip(marks, marks[1:])]
    steady = per_epoch[-1] if len(per_epoch) > 1 else per_epoch[0]
    imgs = len(train_ds) + len(valid_ds)
    record = {
        "config": model.model_name, "tag": args.tag,
        "pipeline": ("PNG decode@%d -> HBM-resident (scan epochs) -> device RandomResizedCrop 224"
                     if args.resident else
                     "PNG decode@%d -> host loader -> device RandomResizedCrop 224") % args.decode,
        "scheduler": "step(%d, 0.1)" % args.lr_step,
        "train_images": len(train_ds), "valid_images": len(valid_ds),
        "epochs": args.epochs,
        "epoch_seconds": [round(t, 1) for t in per_epoch],
        "steady_epoch_s": round(steady, 1),
        "steady_img_s_224": round(imgs / steady, 1),
        "total_min": round(total / 60, 2),
        "final_valid_pct": round(trainer.epoch_results["valid_score"][-1] * 100, 2),
        "valid_curve_pct": [round(v * 100, 2)
                            for v in trainer.epoch_results["valid_score"]],
        "lr_curve": trainer.epoch_results["learning_rate"],
    }
    path = os.path.join(args.out, f"RESULT-rehearsal224-{model.model_name}-{args.tag}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {path}", flush=True)


if __name__ == "__main__":
    main()
