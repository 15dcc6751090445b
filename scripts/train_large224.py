""">HBM 224-class training at speed — the BASELINE config #3 shape on a
split too big for device memory (r3 VERDICT missing #1 / next-step #1).

ImageNet is not on disk (zero-egress env), so the large split is CINIC-10's
train(+valid) PNGs decoded ONCE at --decode (default 256²) into a disk
memmap cache (~20 GB/100k images; ImageFolderDataset memmap-build mode),
then rotated through HBM by the ShardRotationLoader: each epoch's global
permutation is gathered chunk-by-chunk from the page cache and
device_put'd double-buffered while the previous chunk's whole-chunk
lax.scan trains on device (engine._run_chunked_train_epoch). Train-time
RandomResizedCrop→224 + hflip runs on device inside the scan.

The r3 state of this shape was the host-streaming DataLoader at
~35-160 img/s (decode-bound on the 1-core host); the target here is
>=2,000 img/s steady on >=100k images.

Usage:
  python scripts/train_large224.py --kind 50 --epochs 3 --images 120000
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def build_merged_subset(dst_root, total_images, seed=0):
    """Class-balanced symlink tree drawing from CINIC train THEN valid
    (train is 90k; >90k targets take the remainder from valid). Returns
    the tree root. An existing tree is reused as-is."""
    per_class = total_images // 10
    dst = os.path.join(dst_root, f"big{total_images // 1000}k")
    if os.path.isdir(dst):
        return dst
    rng = random.Random(seed)
    classes = sorted(
        d for d in os.listdir(os.path.join(CINIC_ROOT, "train"))
        if os.path.isdir(os.path.join(CINIC_ROOT, "train", d)))
    for cname in classes:
        out = os.path.join(dst, cname)
        os.makedirs(out, exist_ok=True)
        picked = 0
        for split in ("train", "valid"):
            if picked >= per_class:
                break
            cdir = os.path.join(CINIC_ROOT, split, cname)
            files = sorted(os.listdir(cdir))
            rng.shuffle(files)
            for fname in files:
                if picked >= per_class:
                    break
                link = os.path.join(out, f"{split}-{fname}")
                if not os.path.exists(link):
                    os.symlink(os.path.join(cdir, fname), link)
                picked += 1
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--kind", default="50")
    ap.add_argument("--images", type=int, default=120000)
    ap.add_argument("--valid-per-class", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--decode", type=int, default=256)
    ap.add_argument("--chunk-gb", type=float, default=2.0)
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--decode-only", action="store_true",
                    help="build the disk decode cache and exit (run with "
                         "PALLAS_AXON_POOL_IPS= so the TPU stays free)")
    args = ap.parse_args()

    train_dir = build_merged_subset("data/large224", args.images)
    # valid: a small held-out slice from CINIC test (never in the train tree)
    from scripts.rehearsal224 import build_subset

    valid_dir = build_subset(CINIC_ROOT, "data/large224", "test",
                             args.valid_per_class)

    from convnets_tpu.data.datasets import ImageFolderDataset
    from convnets_tpu.data.loader import DeviceCacheLoader
    from convnets_tpu.data.stream import ShardRotationLoader
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=args.kind, input_size=(3, 224, 224), num_classes=10,
        batch_size=args.batch, epochs=args.epochs,
        learning_rate=args.lr, weight_decay=1e-4, dropout_rate=0.0,
        optimizer="sgd", momentum=0.9,
        lr_scheduler="step", lr_step_size=30, lr_factor=0.1,
        data_augment=True, data_norm=True,
        loss_reduction="mean", early_stop=False, loss_optim=False,
        mixed_precision=True, output_dir=args.out,
        device_cache=False,
    )

    dec = (args.decode, args.decode)
    cache_dir = os.path.join("data", "cache")
    t_decode0 = time.perf_counter()
    train_ds = ImageFolderDataset(
        train_dir, image_size=dec,
        disk_cache=os.path.join(
            cache_dir, f"large224-{args.images // 1000}k-{args.decode}.npy"))
    valid_ds = ImageFolderDataset(
        valid_dir, image_size=dec,
        disk_cache=os.path.join(
            cache_dir,
            f"large224-valid-{args.valid_per_class}x{args.decode}.npy"))

    # pre-decode: fill (and publish) the disk memmap cache up front so the
    # one-time decode cost is accounted separately and drop_last epochs
    # can't leave a tail of rows undecoded (which would block publication)
    import numpy as np

    if not train_ds._cached.all():
        print(f"pre-decoding {len(train_ds)} images @{args.decode} ...",
              flush=True)
        for lo in range(0, len(train_ds), 8192):
            hi = min(lo + 8192, len(train_ds))
            train_ds.load_raw(np.arange(lo, hi))
            el = time.perf_counter() - t_decode0
            print(f"  {hi}/{len(train_ds)} decoded "
                  f"({hi / el:.0f} img/s)", flush=True)
    decode_s = time.perf_counter() - t_decode0
    print(f"decode cache ready in {decode_s:.0f} s", flush=True)
    if args.decode_only:
        if not valid_ds._cached.all():
            valid_ds.load_raw(np.arange(len(valid_ds)))
        print("decode-only: caches published, exiting", flush=True)
        return

    trainset = ShardRotationLoader(
        train_ds, args.batch, shuffle=True, seed=setting.seed,
        drop_last=True, chunk_bytes=int(args.chunk_gb * (1 << 30)))
    validset = DeviceCacheLoader(valid_ds, args.batch)
    trainset.augment, trainset.normalize = True, True
    validset.augment, validset.normalize = False, True

    model = build_model(args.arch, setting)
    trainer = Trainer(model)
    gb = len(train_ds) * int(3 * args.decode ** 2) / (1 << 30)
    print(f"== large224: {model.model_name} train={len(train_ds)} imgs "
          f"({gb:.1f} GB decoded @{args.decode}) in "
          f"{trainset.num_chunks} chunks × {args.chunk_gb} GB; "
          f"valid={len(valid_ds)} ==", flush=True)

    epoch_times = []
    trainer.epoch_hook = lambda tr, e: epoch_times.append(time.perf_counter())
    t0 = time.perf_counter()
    trainer.fit(trainset, validset)
    total = time.perf_counter() - t0

    marks = [t0] + epoch_times
    per_epoch = [b - a for a, b in zip(marks, marks[1:])]
    steady = min(per_epoch[1:]) if len(per_epoch) > 1 else per_epoch[0]
    n_train = (len(train_ds) // args.batch) * args.batch  # drop_last
    record = {
        "config": model.model_name, "tag": args.tag,
        "pipeline": (f"memmap decode-cache @{args.decode} -> "
                     f"ShardRotationLoader ({trainset.num_chunks} chunks x "
                     f"{args.chunk_gb} GB, double-buffered) -> "
                     f"device RandomResizedCrop 224 (scanned sub-epochs)"),
        "train_images": len(train_ds),
        "decoded_gb": round(gb, 1),
        "epochs": args.epochs,
        "decode_cache_build_s": round(decode_s, 1),
        "epoch_seconds": [round(t, 1) for t in per_epoch],
        "steady_epoch_s": round(steady, 1),
        "steady_img_s_224": round(n_train / steady, 1),
        "total_min": round(total / 60, 2),
        "valid_curve_pct": [round(v * 100, 2)
                            for v in trainer.epoch_results["valid_score"]],
    }
    path = os.path.join(
        args.out, f"RESULT-large224-{model.model_name}-{args.tag}.json")
    os.makedirs(args.out, exist_ok=True)
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {path}", flush=True)


if __name__ == "__main__":
    main()
