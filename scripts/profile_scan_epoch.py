"""Profile ONE scanned CINIC epoch on the real chip.

Evidence for the whole-epoch lax.scan claim (PERF.md §4): the epoch is a
single dispatch, so the device trace should show back-to-back steps with
no host-induced gaps. Parse with scripts/analyze_xplane.py (pass the
number of scan steps so per-step numbers come out right).

Usage: python scripts/profile_scan_epoch.py [--trace-dir /tmp/scan_trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/scan_trace")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    print("platform:", jax.devices()[0].platform, flush=True)
    setting = Settings(
        kind="26", input_size=(3, 32, 32), num_classes=10,
        batch_size=args.batch, epochs=3, mixed_precision=True,
        data_augment=True, augment_affine=False, data_norm=True,
        optimizer="sgd", lr_scheduler="none", learning_rate=0.05,
        early_stop=False, output_dir="/tmp/bench_out",
    )
    data = DataMngr(setting, root="/root/reference/data/CINIC-10")
    trainset = data.load_train()
    trainer = Trainer(build_model("resnet", setting))
    trainer.init_state()

    trainer._run_train_epoch(trainset, 0)  # upload + compile
    steps = len(trainset)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        trainer._run_train_epoch(trainset, 1)
    dt = time.perf_counter() - t0
    n_real = trainer._loader_host_count(trainset)  # excludes padded rows
    print(json.dumps({
        "trace_dir": args.trace_dir, "scan_steps": steps,
        "epoch_s": round(dt, 3),
        "step_ms": round(dt / steps * 1e3, 3),
        "img_per_s": round(n_real / dt, 1),
    }))
    print(f"parse with: python scripts/analyze_xplane.py {args.trace_dir} {steps}")


if __name__ == "__main__":
    main()
