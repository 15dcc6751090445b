"""A/B XLA compiler options on the flagship RN50@224 train step.

XLA_FLAGS env tuning is impossible through the axon relay (the server
parses its own flags and aborts on unknown client values — PERF.md §4),
but per-executable compiler options travel inside the PJRT compile request
via jit(...).lower(...).compile(compiler_options=...). This script measures
a small set of plausible wins against the baseline; unknown/rejected
options are reported and skipped.

Usage: python scripts/tpu_flag_ab.py [steps]
Writes data/output/flag_ab.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CANDIDATES = [
    ("baseline", None),
    ("latency_hiding_scheduler",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("scoped_vmem_96mb", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("scoped_vmem_32mb", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("async_all_fusion", {"xla_tpu_enable_async_collective_fusion": "true"}),
    ("flash_layouts", {"xla_tpu_use_minor_sharding_for_major_trivial_input":
                       "true"}),
    # r4: the r3 sweep's one winner was scoped_vmem_32mb (+3%) — refine the
    # grid around it, and battery-test further cost-model/fusion levers
    # (unknown names are rejected by the server and skipped)
    ("scoped_vmem_20mb", {"xla_tpu_scoped_vmem_limit_kib": "20480"}),
    ("scoped_vmem_24mb", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("scoped_vmem_28mb", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),
    ("scoped_vmem_40mb", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("scoped_vmem_48mb", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_64mb", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem32_latency", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                        "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("vector_load_fusion", {"xla_tpu_vector_load_fusion_limit": "1024"}),
    ("licm", {"xla_tpu_enable_vmem_to_vmem_dmas": "true"}),
    ("dot_reduction", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("bloat_factor", {"xla_tpu_async_copy_bandwidth_scaling_factor": "1.5"}),
    ("vmem32_rwb_off", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                        "xla_tpu_rwb_fusion": "false"}),
]


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
    # the raw step fn (un-jitted) so each variant compiles fresh
    raw = trainer._build_train_step(False, False, False, None, True, False, 0.0)

    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)

    results = {}
    for name, opts in CANDIDATES:
        try:
            t0 = time.perf_counter()
            lowered = jax.jit(raw).lower(trainer.state, x, y, w, key)
            compiled = (lowered.compile(compiler_options=opts)
                        if opts else lowered.compile())
            compile_s = time.perf_counter() - t0
        except Exception as e:  # unknown option → record and move on
            results[name] = {"error": str(e)[:160]}
            print(f"{name}: REJECTED {str(e)[:120]}", flush=True)
            continue
        state = trainer.state
        for i in range(5):
            state, loss, c = compiled(state, x, y, w, jax.random.fold_in(key, i))
        _ = np.asarray(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss, c = compiled(state, x, y, w,
                                      jax.random.fold_in(key, 100 + i))
        _ = np.asarray(loss)
        dt = time.perf_counter() - t0
        results[name] = {
            "step_ms": round(dt / steps * 1e3, 2),
            "img_per_s": round(batch * steps / dt, 1),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name}: {results[name]}", flush=True)
        # keep trainer.state alive: compiled() donated nothing (no
        # donate_argnums on this jit), so state stays valid

    os.makedirs("data/output", exist_ok=True)
    with open("data/output/flag_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
