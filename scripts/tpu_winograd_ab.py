"""Full-step Winograd A/B on the axon chip (PERF.md §5 protocol).

Same-process comparison — per-call and cross-day numbers through the relay
are untrustworthy (±40% swings, PERF.md §5), so every mode is traced,
compiled and timed inside ONE process, two timed passes per mode.

Modes: direct (CONVNETS_TPU_WINOGRAD=0), F(2,3) everywhere, F(4,3)
everywhere, plus optional per-shape subsets via the auto-table hook.

Usage (run ONE at a time on the chip):
  python scripts/tpu_winograd_ab.py rn50      # RN50 @224 b256 train step
  python scripts/tpu_winograd_ab.py rn26      # RN26 @32 b256 (CINIC class)
  python scripts/tpu_winograd_ab.py vgg11     # all-3x3 net @32 b256
  python scripts/tpu_winograd_ab.py dn121     # DenseNet-121 @224 b256

Writes data/output/winograd_ab_<tag>.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

CONFIGS = {
    "rn50": ("resnet", "50", 224, 256, 1000),
    "rn26": ("resnet", "26", 32, 256, 10),
    "vgg11": ("vggnet", "11", 32, 256, 10),
    "dn121": ("densenet", "121", 224, 256, 1000),
}


def build_step(arch, kind, image, batch, classes):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=kind, input_size=(3, image, image), num_classes=classes,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.0, weight_decay=1e-4,
    )
    model = build_model(arch, setting)
    trainer = Trainer(model)
    trainer.init_state()
    fn = trainer._get_train_step(augment=False, norm=False)
    return trainer, fn


def time_mode(arch, kind, image, batch, classes, steps=20, warmup=5, passes=2):
    trainer, fn = build_step(arch, kind, image, batch, classes)
    x = jax.random.uniform(jax.random.key(0), (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, classes, jnp.int32)
    wv = jnp.ones((batch,), jnp.float32)
    state = trainer.state
    for i in range(warmup):
        state, loss, c = fn(state, x, y, wv, jax.random.fold_in(jax.random.key(2), i))
    _ = np.asarray(loss)  # device fence (relay-safe readback)
    out = []
    for _p in range(passes):
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss, c = fn(state, x, y, wv,
                                jax.random.fold_in(jax.random.key(3), i))
        _ = np.asarray(loss)
        dt = (time.perf_counter() - t0) / steps
        out.append(round(dt * 1000.0, 2))
    del trainer, fn, state
    return out


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "rn50"
    arch, kind, image, batch, classes = CONFIGS[tag]
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["0", "2", "4"]
    rec = {"config": tag, "image": image, "batch": batch, "modes": {}}
    for mode in modes:
        if mode.startswith("{"):  # per-shape table experiment
            os.environ["CONVNETS_TPU_WINOGRAD"] = "auto"
            os.environ["CONVNETS_TPU_WINOGRAD_TABLE"] = mode
            label = "table:" + mode
        else:
            os.environ["CONVNETS_TPU_WINOGRAD"] = mode
            os.environ.pop("CONVNETS_TPU_WINOGRAD_TABLE", None)
            label = {"0": "direct"}.get(mode, f"F({mode},3)")
        ms = time_mode(arch, kind, image, batch, classes)
        rec["modes"][label] = {
            "step_ms_passes": ms,
            "img_per_s_best": round(batch / (min(ms) / 1000.0), 1),
        }
        print(label, ms, flush=True)
    path = f"data/output/winograd_ab_{tag}.json"
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
