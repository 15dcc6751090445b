"""Focused sweep of xla_tpu_scoped_vmem_limit_kib on the production
RN50@224 train step (sharded + donated jit — the exact bench.py path).

The broad A/B (scripts/tpu_flag_ab.py, data/output/flag_ab.json) showed
32 MB scoped VMEM ~3% faster than the default; per-call relay numbers
swing day-to-day, so this sweep interleaves baseline and candidates
A,B,A,B within one process and reports both passes.

Usage: python scripts/tpu_vmem_sweep.py [steps_per_pass]
Writes data/output/vmem_sweep.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LIMITS_KIB = [None, 16384, 24576, 32768, 49152]


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    print("platform:", jax.devices()[0].platform, flush=True)
    batch, image = 256, 224
    setting = Settings(
        kind="50", input_size=(3, image, image), num_classes=1000,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.5, weight_decay=1e-4,
    )
    model = build_model("resnet", setting)
    trainer = Trainer(model)
    trainer.init_state()
    step = trainer._get_train_step(augment=False, norm=False)

    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)

    lowered = step.lower(trainer.state, x, y, w, key)
    compiled = {}
    for lim in LIMITS_KIB:
        name = "default" if lim is None else f"{lim // 1024}mb"
        opts = None if lim is None else {
            "xla_tpu_scoped_vmem_limit_kib": str(lim)}
        try:
            compiled[name] = (lowered.compile(compiler_options=opts)
                              if opts else lowered.compile())
            print(f"compiled {name}", flush=True)
        except Exception as e:
            print(f"{name}: REJECTED {str(e)[:120]}", flush=True)

    state = trainer.state
    results = {name: [] for name in compiled}
    for rep in range(2):  # interleaved passes: A,B,C,… then again
        for name, fn in compiled.items():
            for i in range(3):  # re-warm this executable
                state, loss, c = fn(state, x, y, w, jax.random.fold_in(key, i))
            _ = np.asarray(loss)
            t0 = time.perf_counter()
            for i in range(steps):
                state, loss, c = fn(state, x, y, w,
                                    jax.random.fold_in(key, 100 + i))
            _ = np.asarray(loss)
            dt = time.perf_counter() - t0
            results[name].append(round(dt / steps * 1e3, 2))
            print(f"pass {rep} {name}: {dt / steps * 1e3:.2f} ms/step",
                  flush=True)

    summary = {k: {"step_ms_passes": v,
                   "img_per_s_best": round(256 / min(v) * 1e3, 1)}
               for k, v in results.items()}
    os.makedirs("data/output", exist_ok=True)
    with open("data/output/vmem_sweep.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
