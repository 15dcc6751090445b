"""Full-chain A/B of the whole-bottleneck-block megakernel vs XLA
(r3 VERDICT #2; PERF.md §5 protocol: repetition-chained jits + D2H fence,
never single-call timings through the relay).

Two arms per shape, each one jit: the block applied as a CHAIN (length =
the block count RN50 actually runs at that shape) and the chain repeated
REPS times via lax.scan with the output fed back in — one dispatch per
measurement, so the ~10 ms relay dispatch floor divides out and XLA sees
the same fusion/latency-hiding scope it would inside a real model stage.

Shapes (RN50@224, batch 256): stage-3 14²×1024/256 (6 blocks) and
stage-2 28²×512/128 (4 blocks).

Usage: python scripts/tpu_block_ab.py [--batch 256] [--reps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="data/output/block_ab.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from convnets_tpu.ops.pallas.block import (
        bottleneck_block, bottleneck_block_reference,
    )

    dt = jnp.dtype(args.dtype)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    SHAPES = [
        # (name, H, Cin, Cmid, chain_len)
        ("stage3_14x1024", 14, 1024, 256, 6),
        ("stage2_28x512", 28, 512, 128, 4),
    ]

    results = {"batch": args.batch, "reps": args.reps, "dtype": args.dtype,
               "shapes": {}}

    for name, h, cin, cmid, chain in SHAPES:
        key = jax.random.key(0)
        ks = jax.random.split(key, 10)
        n = args.batch
        x = jax.random.normal(ks[0], (n, h, h, cin), dt)
        w1 = (jax.random.normal(ks[1], (cin, cmid), jnp.float32)
              / np.sqrt(cin)).astype(dt)
        w2 = (jax.random.normal(ks[2], (3, 3, cmid, cmid), jnp.float32)
              / np.sqrt(9 * cmid)).astype(dt)
        w3 = (jax.random.normal(ks[3], (cmid, cin), jnp.float32)
              / np.sqrt(cmid)).astype(dt)
        s1 = jax.random.uniform(ks[4], (cmid,), jnp.float32, 0.9, 1.1)
        b1 = jax.random.normal(ks[5], (cmid,), jnp.float32) * 0.01
        s2 = jax.random.uniform(ks[6], (cmid,), jnp.float32, 0.9, 1.1)
        b2 = jax.random.normal(ks[7], (cmid,), jnp.float32) * 0.01
        s3 = jax.random.uniform(ks[8], (cin,), jnp.float32, 0.9, 1.1)
        b3 = jax.random.normal(ks[9], (cin,), jnp.float32) * 0.01
        wts = (w1, s1, b1, w2, s2, b2, w3, s3, b3)

        def chain_fn(block_fn, v):
            for _ in range(chain):
                v = block_fn(v, *wts)
            return v

        def make_arm(block_fn):
            @jax.jit
            def arm(v):
                def body(c, _):
                    c = chain_fn(block_fn, c)
                    # keep magnitudes bounded across reps without breaking
                    # the data dependence (relu+residual grows activations)
                    return (c * jnp.float32(0.25).astype(c.dtype)), None
                c, _ = jax.lax.scan(body, v, None, length=args.reps)
                return c
            return arm

        xla_arm = make_arm(
            lambda v, *a: bottleneck_block_reference(v, *a))
        plz_arm = make_arm(
            lambda v, *a: bottleneck_block(v, *a))

        flops_chain = (2 * n * h * h
                       * (cin * cmid + 9 * cmid * cmid + cmid * cin)
                       * chain)

        row = {"chain_len": chain,
               "gflop_per_chain": round(flops_chain / 1e9, 1)}
        for arm_name, arm in (("xla", xla_arm), ("pallas", plz_arm)):
            try:
                y = arm(x)
                float(np.asarray(jnp.sum(y[0, 0, 0])))  # compile+fence
                best = float("inf")
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    y = arm(x)
                    float(np.asarray(jnp.sum(y[0, 0, 0])))
                    best = min(best, time.perf_counter() - t0)
                ms_chain = best / args.reps * 1e3
                row[arm_name] = {
                    "ms_per_chain": round(ms_chain, 3),
                    "ms_per_block": round(ms_chain / chain, 3),
                    "gflops": round(flops_chain / (ms_chain / 1e3) / 1e9, 1),
                }
                print(f"{name} {arm_name}: {ms_chain:.3f} ms/chain "
                      f"({row[arm_name]['gflops']} GF/s)", flush=True)
            except Exception as e:  # Mosaic compile failures are data too
                row[arm_name] = {"error": f"{type(e).__name__}: {e}"[:400]}
                print(f"{name} {arm_name}: FAILED {type(e).__name__}",
                      flush=True)
        if ("pallas" in row and "ms_per_chain" in row.get("pallas", {})
                and "ms_per_chain" in row.get("xla", {})):
            row["pallas_over_xla"] = round(
                row["pallas"]["ms_per_chain"] / row["xla"]["ms_per_chain"], 3)
        results["shapes"][name] = row

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
