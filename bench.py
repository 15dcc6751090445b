"""Benchmark: ResNet-50/ImageNet-shape training throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

vs_baseline is the fraction of the north-star target (BASELINE.json):
>=90% of the XLA speed-of-light images/sec/chip on TPU v5e. The target
14,400 was derived as 0.9 x 16,000 img/s, treating ResNet-50's published
4.09 G *MACs* per forward as GFLOPs; under the mul+add=2 convention the
197 bf16 TFLOP/s peak uses, train is 3 x 8.2 = 24.6 GFLOP/image and the
physical speed of light is ~8,070 img/s (PERF.md S3). The 14,400 target is
kept as recorded (vs_baseline = measured / 14,400) but sits at 1.78x the
chip's physical limit for this model; see secondary keys sol_img_s /
vs_physical_sol and vs_xla_public for the honest reference points.

Protocol: synthetic on-device data (input pipeline measured separately),
jitted full train step (fwd+bwd+Adam+BN), 5 warmup steps (amortizes compile),
then 20 timed steps bracketed with block_until_ready.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

TARGET_IMG_PER_SEC = 14400.0  # 90% of v5e speed-of-light for RN50 train


def measure(batch: int, image: int, kind: str, warmup: int = 5, steps: int = 20,
            arch: str = "resnet"):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=kind, input_size=(3, image, image), num_classes=1000,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.5, weight_decay=1e-4,
    )
    model = build_model(arch, setting)
    trainer = Trainer(model)
    trainer.init_state()
    step_fn = trainer._get_train_step(augment=False, norm=False)

    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)

    import numpy as np

    state = trainer.state
    for i in range(warmup):
        state, loss, correct = step_fn(state, x, y, w, jax.random.fold_in(key, i))
    # D2H readback, not block_until_ready: the scalar forces the whole
    # dependent step chain to have executed on-device before it can land
    # on the host (block_until_ready alone can return before remote
    # execution completes behind a PJRT tunnel).
    _ = np.asarray(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, correct = step_fn(state, x, y, w, jax.random.fold_in(key, 100 + i))
    _ = np.asarray(loss)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def measure_pipeline(batch: int = 256):
    """Steady-state training throughput WITH the real input pipeline
    attached (CINIC-10 ResNet-26), measured through the production
    fit() epoch path. For CINIC that path is the HBM-resident
    DeviceCacheLoader + whole-epoch lax.scan: the split lives on device,
    one dispatch runs the whole epoch, and only the epoch's index matrix
    crosses the host↔device link. Epoch 0 pays resident upload + compile;
    epochs 1-2 are the timed steady state (_run_train_epoch's device_get
    of the summed metrics is the fence). Complements the synthetic kernel
    bench above, which hides input-bound regimes (the reference feeds 16
    worker processes, mngrdata.py:158-163)."""
    import time as _t

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    root = "/root/reference/data/CINIC-10"
    setting = Settings(
        kind="26", input_size=(3, 32, 32), num_classes=10, batch_size=batch,
        epochs=3, mixed_precision=True, data_augment=True,
        augment_affine=False, data_norm=True, optimizer="sgd",
        lr_scheduler="none", learning_rate=0.05, loss_reduction="mean",
        early_stop=False, output_dir="/tmp/bench_out",
    )
    data = DataMngr(setting, root=root)
    trainset = data.load_train()
    model = build_model("resnet", setting)
    trainer = Trainer(model)
    trainer.init_state()

    trainer._run_train_epoch(trainset, 0)  # resident upload + compile
    n = trainer._loader_host_count(trainset)
    t0 = _t.perf_counter()
    trainer._run_train_epoch(trainset, 1)
    trainer._run_train_epoch(trainset, 2)
    return 2 * n / (_t.perf_counter() - t0)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    if "--pipeline" in sys.argv:
        value = measure_pipeline()
        print(json.dumps({
            "metric": "images_per_sec_pipeline_cinic_resnet26_train",
            "value": round(value, 2), "unit": "img/s",
            "vs_baseline": round(value / TARGET_IMG_PER_SEC, 4),
        }))
        return
    if on_tpu:
        configs = [(256, 224, "50"), (128, 224, "50"), (64, 224, "50")]
    else:  # CPU smoke fallback so the bench never hard-fails in dev
        configs = [(8, 64, "18")]

    value = None
    last_err = None
    for batch, image, kind in configs:
        try:
            value = measure(batch, image, kind)
            break
        except Exception as e:  # OOM → try smaller batch
            last_err = e
            continue
    if value is None:
        print(json.dumps({
            "metric": "images_per_sec_per_chip_resnet50_train",
            "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
            "error": str(last_err)[:200],
        }))
        sys.exit(0)

    record = {
        "metric": "images_per_sec_per_chip_resnet50_train"
        if on_tpu else "images_per_sec_cpu_smoke_resnet18_train",
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / TARGET_IMG_PER_SEC, 4) if on_tpu else 0.0,
    }

    if on_tpu and "--no-stress" not in sys.argv:
        # secondary 224-shape stress benches (BASELINE configs #4/#5:
        # depthwise MobileNet-v1 and concat-heavy DenseNet-121); failures
        # here must never cost the primary metric
        secondary = {}
        for arch, kind, name in (("mobilenet_v1", "standard", "mobilenet_v1"),
                                 ("densenet", "121", "densenet121")):
            for b in (256, 128, 64):
                try:
                    secondary[f"{name}_224_train_img_s"] = round(
                        measure(b, 224, kind, arch=arch), 2)
                    secondary[f"{name}_224_batch"] = b
                    break
                except Exception as e:
                    secondary[f"{name}_224_error"] = str(e)[:120]
        # real-data pipeline throughput (CINIC RN26 through the production
        # fit() path: HBM-resident split + whole-epoch scan + on-device
        # separable augment)
        try:
            secondary["pipeline_cinic_rn26_img_s"] = round(measure_pipeline(), 2)
        except Exception as e:
            secondary["pipeline_error"] = str(e)[:120]
        # context: the 14,400 target was derived from a MAC/FLOP convention
        # mixup (docstring): the chip's physical speed of light for RN50
        # train (24.6 GFLOP/img, 197 TFLOP/s) is ~8,070 img/s, and public
        # XLA RN50-on-v5e lands at ~2,300-2,400 img/s/chip — these keys
        # situate the number against the two honest bars (PERF.md §3/§3b)
        secondary["sol_img_s"] = 8070.0
        secondary["vs_physical_sol"] = round(value / 8070.0, 4)
        secondary["xla_rn50_v5e_public_img_s"] = 2400.0
        secondary["vs_xla_public"] = round(value / 2400.0, 4)
        record["secondary"] = secondary

    print(json.dumps(record))


if __name__ == "__main__":
    main()
