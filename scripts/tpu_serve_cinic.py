"""Production-path proof on real data: trained checkpoint → serving
artifact → test-split accuracy through the artifact alone.

Takes the RESULT json written by scripts/train_cinic.py, exports the run's
best checkpoint with BAKED dataset normalization + class names (symbolic
batch, TPU+CPU), then classifies the full CINIC test split by feeding the
artifact raw [0,1] pixels. Reports served top-1 vs the trainer's own timed
test() top-1, plus a served-vs-live argmax match rate (bf16 schedule noise
bound). Writes data/output/serve_cinic.json. Run alone (one TPU process).

Usage: python scripts/tpu_serve_cinic.py data/output/RESULT-ResNet26-r5serve.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CINIC_ROOT = "/root/reference/data/CINIC-10"


def main():
    result_path = sys.argv[1]
    # --uint8: raw bytes on the wire (4x fewer host->device bytes), /255
    # dequant baked into the artifact — the production wire format
    use_u8 = "--uint8" in sys.argv
    with open(result_path) as f:
        record = json.load(f)

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.serve import export_trainer, load_artifact
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    kind = record["config"].replace("ResNet", "")
    setting = Settings(kind=kind, input_size=(3, 32, 32), num_classes=10,
                       batch_size=256, mixed_precision=True,
                       data_augment=False, data_norm=True,
                       output_dir=os.path.dirname(record["checkpoint"]))
    model = build_model("resnet", setting)
    trainer = Trainer(model)
    trainer.load_checkpoint(record["checkpoint"])

    data = DataMngr(setting, root=CINIC_ROOT)
    ds = data.load_test().dataset

    path = "/tmp/rn_cinic_serve.cnx"
    meta = export_trainer(trainer, path, stats=(ds.mean, ds.std),
                          class_names=ds.class_names,
                          input_dtype="uint8" if use_u8 else "float32")
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {meta['model_name']} ({size_mb:.1f} MB, baked norm, "
          f"wire={meta['input_dtype']}, classes={len(ds.class_names)})",
          flush=True)

    served = load_artifact(path)
    n = len(ds)
    bs = 512
    correct = 0
    live_match = live_seen = 0
    mean = np.asarray(ds.mean, np.float32).reshape(1, 1, 1, 3)
    std = np.asarray(ds.std, np.float32).reshape(1, 1, 1, 3)
    t0 = time.perf_counter()
    for i0 in range(0, n, bs):
        idx = np.arange(i0, min(i0 + bs, n))
        if use_u8:
            xw, y = ds.load_raw(idx)  # uint8 raw bytes on the wire
        else:
            xw, y = ds.load(idx)     # fp32 [0,1] raw pixels
        pred = np.argmax(np.asarray(served(xw)), axis=-1)
        correct += int((pred == y).sum())
        if i0 < 4 * bs:              # live argmax agreement on a sample
            x = xw.astype(np.float32) / 255.0 if use_u8 else xw
            live, _ = model.apply(
                trainer_variables(trainer), jnp.asarray((x - mean) / std),
                train=False)
            lp = np.argmax(np.asarray(live), axis=-1)
            live_match += int((pred == lp).sum())
            live_seen += len(idx)
    wall = time.perf_counter() - t0
    served_top1 = 100.0 * correct / n
    match_pct = 100.0 * live_match / max(live_seen, 1)
    print(f"served top-1 {served_top1:.2f}% on {n} images in {wall:.1f} s "
          f"({n/wall:.0f} img/s end-to-end incl. host feed); "
          f"trainer.test top-1 {record['test_top1_pct']}%; "
          f"served==live argmax {match_pct:.2f}% of {live_seen}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(result_path)),
                       "serve_cinic_u8.json" if use_u8 else "serve_cinic.json")
    with open(out, "w") as f:
        json.dump({
            "config": record["config"],
            "checkpoint": record["checkpoint"],
            "artifact_mb": round(size_mb, 1),
            "meta": meta,
            "served_test_top1_pct": round(served_top1, 2),
            "trainer_test_top1_pct": record["test_top1_pct"],
            "served_vs_live_argmax_match_pct": round(match_pct, 2),
            "images": n,
            "serve_wall_s": round(wall, 1),
            "serve_img_s_end_to_end": round(n / wall, 1),
        }, f, indent=2)
    print(f"wrote {out}", flush=True)


def trainer_variables(trainer):
    return {"params": trainer.state.params, "state": trainer.state.model_state}


if __name__ == "__main__":
    main()
