"""Per-layer-shape A/B: tiled Pallas conv(+BN-stats) vs XLA at the
ResNet-50/224 flagship shapes (r2 VERDICT next-steps #1).

For every distinct conv shape in RN50 at 224×224 (batch 256, bf16) this
times, with a D2H readback fence (block_until_ready returns early through
the axon tunnel):

  * XLA:     lax conv → fp32 Σy/Σy² reduction (the unfused train-mode
             conv+BN statistics path)
  * Pallas:  conv2d_stats — implicit-GEMM kernel with in-kernel stats
             (whole-sample when it fits VMEM, OH-slab tiled otherwise)

plus eval-mode conv2d_fused vs lax conv. Writes PALLAS_AB.md (the
committed table the VERDICT asks for) and a JSON artifact.

Usage: python scripts/ab_conv224.py [--batch 256] [--steps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, H, Cin, Cout, k, stride) — every distinct conv shape in RN50@224
# (reference resnet.py:29-36 config '50'; shortcut projections included)
RN50_SHAPES = [
    ("stem",        224,    3,   64, 7, 2),
    ("l1.compress",  56,   64,   64, 1, 1),
    ("l1.spatial",   56,   64,   64, 3, 1),
    ("l1.expand",    56,   64,  256, 1, 1),
    ("l1.shortcut",  56,   64,  256, 1, 1),
    ("l1.compress2", 56,  256,   64, 1, 1),
    ("l2.compress",  56,  256,  128, 1, 1),
    ("l2.spatial/2", 56,  128,  128, 3, 2),
    ("l2.shortcut/2", 56, 256,  512, 1, 2),
    ("l2.expand",    28,  128,  512, 1, 1),
    ("l2.compress2", 28,  512,  128, 1, 1),
    ("l2.spatial",   28,  128,  128, 3, 1),
    ("l3.compress",  28,  512,  256, 1, 1),
    ("l3.spatial/2", 28,  256,  256, 3, 2),
    ("l3.shortcut/2", 28, 512, 1024, 1, 2),
    ("l3.expand",    14,  256, 1024, 1, 1),
    ("l3.compress2", 14, 1024,  256, 1, 1),
    ("l3.spatial",   14,  256,  256, 3, 1),
    ("l4.compress",  14, 1024,  512, 1, 1),
    ("l4.spatial/2", 14,  512,  512, 3, 2),
    ("l4.shortcut/2", 14, 1024, 2048, 1, 2),
    ("l4.expand",     7,  512, 2048, 1, 1),
    ("l4.compress2",  7, 2048,  512, 1, 1),
    ("l4.spatial",    7,  512,  512, 3, 1),
]


def timeit(fn, *args, steps=10, warmup=3):
    import numpy as np

    out = None
    for _ in range(warmup):
        out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(leaf[(0,) * leaf.ndim])  # D2H fence
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="PALLAS_AB.md")
    ap.add_argument("--json", default="data/output/ab_conv224.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated layer names; merge results into "
                         "the existing JSON (one shape per process survives "
                         "relay wedges)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnets_tpu import ops
    from convnets_tpu.ops.pallas import conv as pconv

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def xla_stats(x, w, stride, padding):
        y = ops.conv2d(x, w, stride=stride, padding=padding)
        yf = y.astype(jnp.float32)
        return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))

    xla_conv = partial(jax.jit, static_argnums=(2, 3))(
        lambda x, w, s, p: ops.conv2d(x, w, stride=s, padding=p))

    prior = {}
    if args.only and os.path.exists(args.json):
        with open(args.json) as f:
            prior = {r["layer"]: r for r in json.load(f)}
    only = set(args.only.split(",")) if args.only else None

    rows = []
    n = args.batch
    for name, h, cin, cout, k, s in RN50_SHAPES:
        if only is not None and name not in only:
            if name in prior:
                rows.append(prior[name])
            continue
        pad = k // 2
        key = jax.random.key(hash(name) % (2**31))
        x = jax.random.normal(key, (n, h, h, cin), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (k, k, cin, cout),
                               jnp.bfloat16) * 0.05)

        def xla_fn(x=x, w=w, s=s, pad=pad):
            return xla_stats(x, w, s, pad)

        def pl_fn(x=x, w=w, s=s, pad=pad):
            return pconv.conv2d_stats(x, w, stride=s, padding=pad)

        def xla_eval(x=x, w=w, s=s, pad=pad):
            return xla_conv(x, w, s, pad)

        def pl_eval(x=x, w=w, s=s, pad=pad):
            return pconv.conv2d_fused(x, w, stride=s, padding=pad)

        try:
            t_xla = timeit(xla_fn, steps=args.steps) * 1e3
            t_pl = timeit(pl_fn, steps=args.steps) * 1e3
            t_xla_e = timeit(xla_eval, steps=args.steps) * 1e3
            t_pl_e = timeit(pl_eval, steps=args.steps) * 1e3
            err = None
        except Exception as e:  # shape not lowerable: record, keep going
            t_xla = t_pl = t_xla_e = t_pl_e = float("nan")
            err = f"{type(e).__name__}: {e}"[:200]

        oh = (h + 2 * pad - k) // s + 1
        gflop = 2 * n * oh * oh * cin * cout * k * k / 1e9
        row = {
            "layer": name, "shape": f"{h}x{h}x{cin}->{cout} k{k} s{s}",
            "gflop": round(gflop, 1),
            "train_xla_ms": round(t_xla, 3), "train_pallas_ms": round(t_pl, 3),
            "eval_xla_ms": round(t_xla_e, 3), "eval_pallas_ms": round(t_pl_e, 3),
            "train_winner": "pallas" if t_pl < t_xla else "xla",
            "error": err,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- report ------------------------------------------------------------
    won = [r for r in rows if r["error"] is None and r["train_winner"] == "pallas"]
    lines = [
        "# Pallas vs XLA at ResNet-50/224 shapes (batch %d, bf16, v5e-1)" % n,
        "",
        "Train column = conv + per-channel fp32 batch-stat sums (the",
        "conv+BN statistics pass); eval = plain conv forward. Pallas =",
        "`ops/pallas/conv.py` implicit GEMM (whole-sample or OH-slab tiled;",
        "stride 2 via space-to-depth). Times per call, D2H-fenced, %d reps."
        % args.steps,
        "",
        "| layer | shape | GFLOP | train XLA ms | train Pallas ms | eval XLA ms | eval Pallas ms | train winner |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if r["error"]:
            lines.append(f"| {r['layer']} | {r['shape']} | {r['gflop']} | "
                         f"— | — | — | — | error: {r['error'][:60]} |")
        else:
            lines.append(
                f"| {r['layer']} | {r['shape']} | {r['gflop']} | "
                f"{r['train_xla_ms']} | {r['train_pallas_ms']} | "
                f"{r['eval_xla_ms']} | {r['eval_pallas_ms']} | "
                f"{r['train_winner']} |")
    ok = [r for r in rows if r["error"] is None]
    lines += [
        "",
        f"Pallas executes in-kernel for {len(ok)}/{len(rows)} shapes; "
        f"wins the train A/B on {len(won)}/{len(ok)} of those.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {args.out} and {args.json}")


if __name__ == "__main__":
    main()
