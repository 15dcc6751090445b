"""224-input training over a >=100k-image split at speed — the TPU-native
answer to BASELINE config #3's input pipeline (r3 VERDICT missing #1).

The measured wall (data/output/h2d_bw.json): host→device through the axon
relay moves ~38 MB/s (38.3 plain / 38.0 under compute, 512 MB buffers; an
earlier small-buffer probe read ~23) — so ANY loader that ships
materialized 224/256-class pixels (196 KB/img) tops out at ~200 img/s,
>12× under the 2,550 img/s RN50 step. The ShardRotationLoader (data/stream.py)
saturates that pipe for genuinely->HBM datasets (scripts/train_large224.py
measures it); this script is the other half of the answer: don't ship
redundant pixels at all.

CINIC's "224 dataset" is synthesized from 32×32 sources (the reference
pipeline upscales on the host, reference mngrdata.py:74-101) — the decoded
256² tensor carries 64× more bytes than information. TPU-native redesign:

  * the split stays at SOURCE resolution on device (180k images = 553 MB
    uint8, one transfer, vs 35 GB materialized at 256²);
  * RandomResizedCrop(source→224) runs inside the scanned train step as
    two tent-weight einsums (data/augment.py::_separable_resample — MXU
    work, not HBM gathers), so the 224 pixels exist only transiently in
    the fused step;
  * the eval path center-crop-resizes source→224 on device the same way.

For a true ImageNet deployment the same principle holds: store the decode
cache at native source resolution (~150 KB/img, the information content)
and synthesize the training view on device; the host pipe then needs
source-bytes/s, not crop-bytes/s.

Usage: python scripts/train_224_sourceres.py --kind 50 --epochs 4
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
    ap.add_argument("--kind", default="50")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--lr-step", type=int, default=30)
    ap.add_argument("--splits", default="train,valid",
                    help="CINIC splits merged into the training set "
                         "(train+valid = 180k images)")
    ap.add_argument("--eval-split", default="test")
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--max-images", type=int, default=0,
                    help="subsample the merged split to N images (seeded "
                         "permutation); 0 = use all")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint residual blocks: RN50@224 with the full "
                         "180k-image split resident sits at the HBM cliff "
                         "(90k resident trains, 180k faults the worker); "
                         "remat trades ~30% step time for the headroom")
    args = ap.parse_args()

    import numpy as np

    from convnets_tpu.data.datasets import ArrayDataset, ImageFolderDataset
    from convnets_tpu.data.loader import DeviceCacheLoader
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    cache_dir = os.path.join("data", "cache")

    # merge splits at native 32² (decode-once disk caches; the train-split
    # cache ships with earlier runs, others decode once at ~1k img/s native)
    t0 = time.perf_counter()
    xs, ys = [], []
    names = None
    for split in args.splits.split(","):
        ds = ImageFolderDataset(
            os.path.join(CINIC_ROOT, split),
            disk_cache=os.path.join(cache_dir, f"CINIC-10-{split}.npy"))
        x, y = ds.load_raw(np.arange(len(ds)))
        xs.append(x)
        ys.append(y)
        names = ds.class_names
    big = ArrayDataset(np.concatenate(xs), np.concatenate(ys),
                       class_names=names)
    del xs, ys
    if args.max_images and len(big) > args.max_images:
        keep = np.random.default_rng(0).permutation(len(big))[:args.max_images]
        big = ArrayDataset(big.images[keep], big.labels[keep],
                           class_names=names)
    eval_ds = ImageFolderDataset(
        os.path.join(CINIC_ROOT, args.eval_split),
        disk_cache=os.path.join(cache_dir, f"CINIC-10-{args.eval_split}.npy"))
    prep_s = time.perf_counter() - t0
    print(f"splits ready in {prep_s:.0f} s: train={len(big)} "
          f"({big.images.nbytes / (1 << 20):.0f} MB uint8 at source res), "
          f"eval={len(eval_ds)}", flush=True)

    setting = Settings(
        kind=args.kind, input_size=(3, 224, 224), num_classes=10,
        batch_size=args.batch, epochs=args.epochs,
        learning_rate=args.lr, weight_decay=1e-4, dropout_rate=0.0,
        optimizer="sgd", momentum=0.9,
        lr_scheduler="step", lr_step_size=args.lr_step, lr_factor=0.1,
        data_augment=True, data_norm=True,
        loss_reduction="mean", early_stop=False, loss_optim=False,
        mixed_precision=True, output_dir=args.out, remat=args.remat,
    )

    trainset = DeviceCacheLoader(big, args.batch, shuffle=True,
                                 seed=setting.seed, drop_last=True)
    validset = DeviceCacheLoader(eval_ds, args.batch)
    trainset.augment, trainset.normalize = True, True
    validset.augment, validset.normalize = False, True

    model = build_model(args.arch, setting)
    trainer = Trainer(model)
    print(f"== sourceres224: {model.model_name} input 224 from 32² resident "
          f"sources; train={len(big)} eval={len(eval_ds)} ==", flush=True)

    epoch_times = []
    trainer.epoch_hook = lambda tr, e: epoch_times.append(time.perf_counter())
    t0 = time.perf_counter()
    trainer.fit(trainset, validset)
    total = time.perf_counter() - t0

    marks = [t0] + epoch_times
    per_epoch = [b - a for a, b in zip(marks, marks[1:])]
    steady = min(per_epoch[1:]) if len(per_epoch) > 1 else per_epoch[0]
    n_train = (len(big) // args.batch) * args.batch
    record = {
        "config": model.model_name, "tag": args.tag,
        "pipeline": ("source-res (32²) split resident in HBM -> device "
                     "RandomResizedCrop->224 inside the scanned train step "
                     "(separable MXU resample); eval center-crop-resize->224"),
        "train_images": len(big),
        "resident_mb_uint8": round(big.images.nbytes / (1 << 20)),
        "epochs": args.epochs,
        "epoch_seconds": [round(t, 1) for t in per_epoch],
        "steady_epoch_s": round(steady, 1),
        "steady_img_s_224": round(n_train / steady, 1),
        "total_min": round(total / 60, 2),
        "valid_curve_pct": [round(v * 100, 2)
                            for v in trainer.epoch_results["valid_score"]],
        "h2d_wall_note": ("materialized-256² streaming through the measured "
                          "38 MB/s relay pipe caps at ~200 img/s; shipping "
                          "source bytes once sidesteps the pipe entirely"),
    }
    path = os.path.join(
        args.out, f"RESULT-sourceres224-{model.model_name}-{args.tag}.json")
    os.makedirs(args.out, exist_ok=True)
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {path}", flush=True)


if __name__ == "__main__":
    main()
