"""Measure host→device transfer bandwidth through the axon relay, and
whether H2D overlaps device compute — the two numbers that size the
ShardRotationLoader's chunk rotation (data/stream.py).

The steady-state feed rate of chunked >HBM training is
    min(step rate, H2D_BW / bytes_per_image)
so with 256²×3 uint8 sources (196,608 B) the 2,550 img/s RN50 step needs
~500 MB/s of overlapped H2D to stay compute-bound.

Usage: python scripts/h2d_bw.py [--mb 512] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    """Device-to-host readback of a data-dependent scalar — the only
    reliable completion fence through the relay (CLAUDE.md timing note)."""
    import numpy as np
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x[::4096])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    nbytes = args.mb << 20
    host = np.random.randint(0, 255, (nbytes,), np.uint8)

    # warm the path (allocator, any lazy setup)
    w = jax.device_put(host[: 64 << 20])
    fence(w)
    del w

    # --- plain H2D -----------------------------------------------------
    bws = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        x = jax.device_put(host)
        fence(x)
        dt = time.perf_counter() - t0
        bws.append(nbytes / dt / (1 << 20))
        del x
        print(f"  put {args.mb} MB: {dt:.3f} s = {bws[-1]:.0f} MB/s", flush=True)
    bw_plain = max(bws)

    # --- H2D while compute runs ----------------------------------------
    # dispatch a long matmul chain, then immediately device_put from the
    # host thread; if the transfer rides under compute, its wall time
    # shrinks toward the plain-H2D time rather than queuing after the chain
    @jax.jit
    def burn(a, n_iter=600):
        def body(c, _):
            return jnp.tanh(c @ a), None
        c, _ = jax.lax.scan(body, a, None, length=n_iter)
        return c

    a = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    burn(a).block_until_ready()  # compile
    t0 = time.perf_counter()
    fut = burn(a)
    t_disp = time.perf_counter()
    x = jax.device_put(host)
    f0 = fence(x)
    t_put = time.perf_counter()
    fence(fut)
    t_all = time.perf_counter()
    print(f"  compute-only estimate: dispatched {t_disp - t0:.3f}s; "
          f"put-under-compute {t_put - t_disp:.3f} s "
          f"({nbytes / (t_put - t_disp) / (1 << 20):.0f} MB/s apparent); "
          f"total {t_all - t0:.3f} s", flush=True)

    # --- parallel streams: does the relay serialize device_puts? --------
    # if concurrent puts scale, the ShardRotationLoader should split each
    # chunk's transfer across threads
    from concurrent.futures import ThreadPoolExecutor

    par = {}
    for nthreads in (2, 4, 8):
        parts = np.array_split(host, nthreads)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nthreads) as ex:
            bufs = list(ex.map(jax.device_put, parts))
        for b in bufs:
            fence(b)
        dt = time.perf_counter() - t0
        par[nthreads] = round(nbytes / dt / (1 << 20), 1)
        print(f"  {nthreads} parallel puts: {dt:.3f} s = "
              f"{par[nthreads]} MB/s", flush=True)
        del bufs

    out = {
        "metric": "h2d_bandwidth", "mb": args.mb,
        "plain_MBps": round(bw_plain, 1),
        "under_compute_MBps": round(nbytes / (t_put - t_disp) / (1 << 20), 1),
        "parallel_MBps": par,
        "img_s_at_256sq": round(bw_plain * (1 << 20) / 196608, 1),
        "img_s_at_224sq": round(bw_plain * (1 << 20) / 150528, 1),
    }
    print(json.dumps(out))
    os.makedirs("data/output", exist_ok=True)
    with open("data/output/h2d_bw.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
