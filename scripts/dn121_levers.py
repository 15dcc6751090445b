"""DenseNet-121@224 step-time lever sweep (r3 VERDICT next-step #5).

The r3 profile (PERF.md §6, data/output/profile_dn121.json): 388.6 ms
train step at batch 256 = 659 img/s, 329 ms of it conv fusions at ~3%
MFU — the growth-rate-32 3×3 convs use 32 of the MXU's 128 output lanes
and the 1×1 bottlenecks contract over ragged concat widths. This script
measures the cheap levers against that baseline in one process:

  * per-executable compiler options (scoped VMEM 32/64 MB — the RN50
    winner, core/aot.py)
  * batch 128 / 512 (512 with remat: dense blocks are the worst
    activation-memory case)
  * bf16 vs f32 params (mixed_precision already bf16 — sanity row)

Writes data/output/dn121_levers.json. Per-step timing is valid here:
steps are ~400 ms, 40× the ~10 ms relay dispatch floor.

Usage: python scripts/dn121_levers.py [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(batch, *, remat=False, opts=None, steps=8, image=224):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind="121", input_size=(3, image, image), num_classes=1000,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.0, weight_decay=1e-4, remat=remat,
    )
    model = build_model("densenet", setting)
    trainer = Trainer(model)
    trainer.init_state()
    raw = trainer._build_train_step(False, False, False, None, True, False,
                                    0.0)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)

    t0 = time.perf_counter()
    lowered = jax.jit(raw).lower(trainer.state, x, y, w, key)
    compiled = (lowered.compile(compiler_options=opts) if opts
                else lowered.compile())
    compile_s = time.perf_counter() - t0

    state = trainer.state
    for i in range(3):
        state, loss, c = compiled(state, x, y, w, jax.random.fold_in(key, i))
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, c = compiled(state, x, y, w,
                                  jax.random.fold_in(key, 100 + i))
    _ = np.asarray(loss)
    dt = time.perf_counter() - t0
    del state, compiled
    return {"step_ms": round(dt / steps * 1e3, 1),
            "img_per_s": round(batch * steps / dt, 1),
            "compile_s": round(compile_s, 1)}


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("platform:", jax.devices()[0].platform, flush=True)
    VMEM32 = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    VMEM64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    rows = [
        ("b256_baseline", dict(batch=256)),
        ("b256_vmem32", dict(batch=256, opts=VMEM32)),
        ("b256_vmem64", dict(batch=256, opts=VMEM64)),
        ("b128", dict(batch=128)),
        ("b128_vmem32", dict(batch=128, opts=VMEM32)),
        ("b512_remat", dict(batch=512, remat=True)),
        ("b512_remat_vmem32", dict(batch=512, remat=True, opts=VMEM32)),
        ("b256_remat_vmem32", dict(batch=256, remat=True, opts=VMEM32)),
    ]
    results = {}
    for name, kw in rows:
        try:
            results[name] = measure(steps=steps, **kw)
            print(f"{name}: {results[name]}", flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    os.makedirs("data/output", exist_ok=True)
    with open("data/output/dn121_levers.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
