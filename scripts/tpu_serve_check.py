"""On-chip validation of the AOT serving path (convnets_tpu.serve).

Exports the flagship ResNet-50 eval forward as a symbolic-batch
TPU+CPU StableHLO artifact, then — in the same TPU process — loads the
artifact back and checks:

  1. the deserialized program runs on the real chip at several batch
     sizes (the symbolic dim specializes at call time),
  2. served logits match the live ``model.apply`` eval path,
  3. serving throughput vs the live jitted eval step (expected: parity —
     it is the same XLA program reconstructed from bytes).

Writes data/output/serve_tpu.json. Run alone (one TPU process rule).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fenced_time(fn, x, iters=20):
    out = fn(x)
    _ = np.asarray(out[0, 0])  # D2H fence (block_until_ready returns early
    t0 = time.perf_counter()   # through the relay, CLAUDE.md)
    for _ in range(iters):
        out = fn(x)
    _ = np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    from convnets_tpu.models import build_model
    from convnets_tpu.serve import load_artifact, save_artifact
    from convnets_tpu.settings import Settings

    assert jax.devices()[0].platform == "tpu", "run on the chip"

    setting = Settings(kind="50", input_size=(3, 224, 224), num_classes=1000,
                       batch_size=256, mixed_precision=True,
                       data_augment=False, data_norm=False)
    model = build_model("resnet", setting)
    variables = model.init(batch_size=8)

    path = "/tmp/rn50_serve.cnx"
    t0 = time.perf_counter()
    meta = save_artifact(path, model, variables)  # symbolic batch, tpu+cpu
    export_s = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported: {size_mb:.1f} MB in {export_s:.1f} s, meta={meta}",
          flush=True)

    served = load_artifact(path)
    record = {"artifact_mb": round(size_mb, 1),
              "export_s": round(export_s, 1), "meta": meta, "batches": {}}

    rng = np.random.RandomState(0)
    for b in (1, 32, 256):
        x = rng.rand(b, 224, 224, 3).astype(np.float32)
        got = np.asarray(served(x))
        live, _ = model.apply(variables, jnp.asarray(x), train=False)
        live = np.asarray(live)
        max_abs = float(np.max(np.abs(got - live)))
        rel = max_abs / max(float(np.max(np.abs(live))), 1e-9)
        print(f"b={b}: served vs live max|Δ|={max_abs:.3e} "
              f"(rel {rel:.3f})", flush=True)
        # bf16 compute: the symbolic-batch program and the per-shape live
        # jit are DIFFERENT XLA schedules, so small batches see bf16
        # reassociation noise; function identity is proven by the fp32
        # phase below (and the artifact is bit-identical at b=256).
        record["batches"][str(b)] = {"max_abs_diff": max_abs,
                                     "rel_to_max_logit": round(rel, 4)}

    # fp32 function-identity check: without bf16 rounding the exported
    # program must reproduce the live forward to float tolerance at every
    # batch, including the b=1 shape where bf16 noise was largest.
    setting32 = Settings(kind="50", input_size=(3, 224, 224),
                         num_classes=1000, batch_size=8,
                         mixed_precision=False, data_augment=False,
                         data_norm=False)
    model32 = build_model("resnet", setting32)
    vars32 = model32.init(batch_size=8)
    path32 = "/tmp/rn50_serve_fp32.cnx"
    save_artifact(path32, model32, vars32)
    served32 = load_artifact(path32)
    record["fp32_identity"] = {}
    for b in (1, 8):
        x = rng.rand(b, 224, 224, 3).astype(np.float32)
        got = np.asarray(served32(x))
        live, _ = model32.apply(vars32, jnp.asarray(x), train=False)
        live = np.asarray(live)
        max_abs = float(np.max(np.abs(got - live)))
        ok = bool(np.allclose(got, live, rtol=1e-4, atol=1e-4))
        print(f"fp32 b={b}: max|Δ|={max_abs:.3e} ok={ok}", flush=True)
        record["fp32_identity"][str(b)] = {"max_abs_diff": max_abs,
                                           "allclose_1e4": ok}

    # throughput A/B at the bench batch
    b = 256
    x = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32)
    live_fn = jax.jit(
        lambda x: model.module.apply(variables, x.astype(jnp.bfloat16),
                                     train=False)[0].astype(jnp.float32))
    t_live = fenced_time(live_fn, x)
    t_served = fenced_time(served._call, x)
    record["eval_b256"] = {
        "live_ms": round(t_live * 1e3, 2),
        "served_ms": round(t_served * 1e3, 2),
        "live_img_s": round(b / t_live, 1),
        "served_img_s": round(b / t_served, 1),
    }
    print(f"eval b256: live {t_live*1e3:.2f} ms ({b/t_live:.0f} img/s) vs "
          f"served {t_served*1e3:.2f} ms ({b/t_served:.0f} img/s)", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "output", "serve_tpu.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
