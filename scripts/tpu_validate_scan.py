"""On-chip A/B: whole-epoch lax.scan vs per-step dispatch (CINIC RN26).

Measures the production fit() epoch path both ways on the real chip:
  per-step — DeviceCacheLoader iterator, one dispatch per batch through the
             axon relay (r2 steady state: ~6.7k img/s, device-side ~24k);
  scanned  — one jitted lax.scan over the whole epoch, one dispatch.

Usage: python scripts/tpu_validate_scan.py [batch]
Writes data/output/scan_ab.json and prints per-epoch timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    print("platform:", jax.devices()[0].platform, flush=True)
    setting = Settings(
        kind="26", input_size=(3, 32, 32), num_classes=10, batch_size=batch,
        epochs=3, mixed_precision=True, data_augment=True,
        augment_affine=False, data_norm=True, optimizer="sgd",
        lr_scheduler="none", learning_rate=0.05, early_stop=False,
        output_dir="/tmp/bench_out",
    )
    data = DataMngr(setting, root="/root/reference/data/CINIC-10")
    trainset = data.load_train()
    n = None
    results = {}

    trainer = Trainer(build_model("resnet", setting))
    trainer.init_state()
    n = trainer._loader_host_count(trainset)

    for mode in ("scan", "per_step"):
        trainset.scan_epochs = (mode == "scan")
        # warmup epoch: resident upload (first time) + compile
        t0 = time.perf_counter()
        trainer._run_train_epoch(trainset, 0)
        warm = time.perf_counter() - t0
        times = []
        for e in (1, 2):
            t0 = time.perf_counter()
            trainer._run_train_epoch(trainset, e)
            times.append(time.perf_counter() - t0)
        img_s = 2 * n / sum(times)
        results[mode] = {"warm_epoch_s": round(warm, 2),
                         "epoch_s": [round(t, 3) for t in times],
                         "img_per_s": round(img_s, 1)}
        print(f"{mode}: warm {warm:.1f}s, epochs {times}, {img_s:.0f} img/s",
              flush=True)

    results["batch"] = batch
    results["num_examples_per_epoch"] = n
    os.makedirs("data/output", exist_ok=True)
    with open("data/output/scan_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
