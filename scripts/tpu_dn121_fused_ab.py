"""Full-step A/B: standard vs shared-stats (fused) DenseNet block on the
chip (r4 VERDICT #8 — the DN121 conv-floor probe; PERF.md §5 protocol:
same process, every mode traced/compiled/timed together, 2 passes).

The fused block (models/densenet.py DenseBlockFused) computes each source
block's batch statistics once instead of once per consumer layer —
O(L) full-buffer reductions per dense block instead of O(L²) — and is
gradient-exact vs the standard composition (tests/test_densenet_fused.py).

Usage: python scripts/tpu_dn121_fused_ab.py [image batch]
Writes data/output/dn121_fused_ab.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_step(image, batch, dropout):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind="121", input_size=(3, image, image), num_classes=1000,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=dropout, weight_decay=1e-4,
    )
    model = build_model("densenet", setting)
    trainer = Trainer(model)
    trainer.init_state()
    fn = trainer._get_train_step(augment=False, norm=False)
    return trainer, fn


def time_mode(image, batch, dropout, steps=20, warmup=5, passes=2):
    trainer, fn = build_step(image, batch, dropout)
    x = jax.random.uniform(jax.random.key(0), (batch, image, image, 3),
                           jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    wv = jnp.ones((batch,), jnp.float32)
    state = trainer.state
    for i in range(warmup):
        state, loss, c = fn(state, x, y, wv,
                            jax.random.fold_in(jax.random.key(2), i))
    _ = np.asarray(loss)  # device fence (relay-safe readback)
    out = []
    for _p in range(passes):
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss, c = fn(state, x, y, wv,
                                jax.random.fold_in(jax.random.key(3), i))
        _ = np.asarray(loss)
        out.append(round((time.perf_counter() - t0) / steps * 1000.0, 2))
    del trainer, fn, state
    return out


def main():
    image = int(sys.argv[1]) if len(sys.argv) > 1 else 224
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rec = {"image": image, "batch": batch, "modes": {}}
    for label, gate, dropout in [("standard", "0", 0.0),
                                 ("fused", "1", 0.0)]:
        os.environ["CONVNETS_TPU_DENSENET_FUSED"] = gate
        try:
            ms = time_mode(image, batch, dropout)
            rec["modes"][label] = {
                "step_ms_passes": ms,
                "img_per_s_best": round(batch / (min(ms) / 1000.0), 1),
            }
        except Exception as e:
            rec["modes"][label] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(label, rec["modes"][label], flush=True)
    path = "data/output/dn121_fused_ab.json"
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
