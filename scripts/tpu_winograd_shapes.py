"""Per-shape Winograd vs direct conv on the chip (r4 VERDICT #2 tail).

The full-step A/B (scripts/tpu_winograd_ab.py -> winograd_ab_rn50.json)
measured F(2,3) 2.9x SLOWER than direct lax.conv on the whole RN50@224
train step and F(4,3) OOM-crashing the worker. This script provides the
per-shape decomposition of that verdict: for each of RN50's four 3x3
stride-1 spatial-conv shapes (batch 256, bf16 — every one 59 GFLOP by
the halve-spatial/double-channel design), it times

  fwd      direct lax.conv  vs  conv2d_winograd m=2 / m=4
  fwd+bwd  jax.grad wrt (x, w) of sum(conv)   (what the step pays)

each as a dependency-chained lax.scan (one dispatch for K iterations;
sub-ms ops through the relay are untimeable per-call, PERF.md §7).
Winograd runs WITHOUT remat here — its best case; the step path further
pays rematerialization (nn/layers.py) because the m=2 domain tensors
otherwise OOM RN50@224.

Usage: python scripts/tpu_winograd_shapes.py
Writes data/output/winograd_shapes.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from convnets_tpu import ops
from convnets_tpu.ops import winograd

BATCH = 256
# RN50 3x3-stride-1 spatial convs: (H, C) with Cin == Cout
SHAPES = [(56, 64), (28, 128), (14, 256), (7, 512)]
PATH = "data/output/winograd_shapes.json"


def chain_time(make_out, x, w, iters):
    """Scan-chain: a scalar from iteration i's output perturbs i+1's
    input so XLA cannot hoist the loop-invariant computation."""

    def body(s, _):
        out = make_out(x * (1.0 + s * 0.0).astype(x.dtype), w)
        return out.reshape(-1)[0].astype(jnp.float32), None

    fn = jax.jit(lambda s: lax.scan(body, s, None, length=iters)[0])
    _ = np.asarray(fn(jnp.float32(0.0)))  # compile + warmup, fenced
    t0 = time.perf_counter()
    _ = np.asarray(fn(jnp.float32(0.0)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = []
    for h, c in SHAPES:
        x = jax.random.normal(jax.random.key(0), (BATCH, h, h, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (3, 3, c, c), jnp.bfloat16)
             * 0.05)

        def direct(x, w):
            return ops.conv2d(x, w, stride=1, padding=1)

        def wino2(x, w):
            return winograd.conv2d_winograd(x, w, padding=1, m=2)

        def wino4(x, w):
            return winograd.conv2d_winograd(x, w, padding=1, m=4)

        def bwd_of(f):
            def g(x, w):
                gx, gw = jax.grad(
                    lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)),
                    argnums=(0, 1))(x, w)
                return gx + 0 * jnp.sum(gw).astype(gx.dtype)
            return g

        row = {"shape": f"{h}x{h}x{c} k3 s1 b{BATCH}", "gflop": round(
            2 * BATCH * h * h * c * c * 9 / 1e9, 1)}
        for label, f in [("fwd_direct", direct), ("fwd_m2", wino2),
                         ("fwd_m4", wino4),
                         ("fwdbwd_direct", bwd_of(direct)),
                         ("fwdbwd_m2", bwd_of(wino2)),
                         ("fwdbwd_m4", bwd_of(wino4))]:
            try:
                ms = chain_time(f, x, w, iters)
                row[label + "_ms"] = round(ms, 4)
            except Exception as e:
                row[label + "_ms"] = None
                row[label + "_error"] = f"{type(e).__name__}: {e}"[:160]
            print(row["shape"], label, row.get(label + "_ms"), flush=True)
        rows.append(row)
        with open(PATH, "w") as f:
            json.dump({"batch": BATCH, "iters": iters, "rows": rows}, f,
                      indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
