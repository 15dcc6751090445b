"""DenseNet-121@224 dropout-cost A/B (r4, follow-up to dn121_levers.py).

dn121_levers measured 140.4 ms/step (1,823 img/s) at b256 with dropout
off — but the recorded r3 "worst citizen" number (388.6 ms / 659 img/s,
PERF.md §6) came from bench.py's Settings with dropout_rate=0.5, which
DenseNet applies inside EVERY dense layer (BN→ReLU→Dropout→1×1 →
BN→ReLU→Dropout→3×3, reference densenet.py:105-140): ~120 bernoulli masks
per step over the fattest activations in the zoo. This isolates that cost
and tests the TPU-native mitigation: generating the masks with XLA's
native RBG generator (`jax_default_prng_impl=unsafe_rbg`) instead of
threefry — dropout needs statistical independence per step, not
threefry's counter-based splittability guarantees, and unsafe_rbg lowers
to the TPU's hardware RNG instruction instead of ~20 rounds of int32
arithmetic per sample.

Writes data/output/dn121_dropout_ab.json. Per-step timing is valid:
steps are >>10 ms relay dispatch floor.

Verdict (v5e-1, b256, bf16): threefry 390.9 ms -> routed hw-RNG 215.1 ms
(1.82x; == the global unsafe_rbg upper bound 217.4, so dropout is the only
RNG-hot stream) -> dropout-off floor 140.2 ms. The routed path (engine
rewraps only the dropout key via core.rng.hw_dropout_key) is now the
default; CONVNETS_TPU_HW_RNG=0 restores historical threefry masks.

Usage: python scripts/dn121_dropout_ab.py [--impl threefry|unsafe_rbg] [steps]
  (one impl per process — the PRNG impl is fixed at first key creation;
   run twice and merge, or use --merge to update the artifact in place)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "data/output/dn121_dropout_ab.json"


def measure(batch, *, dropout, steps, image=224):
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    raw = trainer._build_train_step(False, False, False, None, True, False,
                                    0.0)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)

    compiled = jax.jit(raw).lower(trainer.state, x, y, w, key).compile()
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
            "img_per_s": round(batch * steps / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="threefry",
                    choices=["threefry", "unsafe_rbg", "rbg", "routed"])
    ap.add_argument("steps", nargs="?", type=int, default=8)
    args = ap.parse_args()

    # "threefry" = the historical pure-threefry path (engine hw-RNG gate off);
    # "routed"   = the production path: global threefry, engine rewraps ONLY
    #              the dropout stream via core.rng.hw_dropout_key;
    # "unsafe_rbg"/"rbg" = global PRNG impl flag (upper bound: every stream).
    os.environ["CONVNETS_TPU_HW_RNG"] = "0" if args.impl == "threefry" else "1"
    import jax
    if args.impl not in ("threefry", "routed"):
        jax.config.update("jax_default_prng_impl", args.impl)
    print("platform:", jax.devices()[0].platform, "impl:", args.impl,
          flush=True)

    rows = {}
    for name, dropout in ((f"b256_dropout0.5_{args.impl}", 0.5),
                          ("b256_dropout0" if args.impl == "threefry" else None,
                           0.0)):
        if name is None:
            continue
        try:
            rows[name] = measure(256, dropout=dropout, steps=args.steps)
            print(f"{name}: {rows[name]}", flush=True)
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged.update(rows)
    os.makedirs("data/output", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
