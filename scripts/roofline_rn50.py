"""Per-conv roofline for the RN50@224 train step (VERDICT r4 #6).

Turns PERF.md §8's "~20% MXU is the XLA conv ceiling" argument into
arithmetic: for EVERY conv_general_dilated instance in the compiled train
step (forward + both backward passes — enumerated from the jaxpr, so
nothing is hand-listed), compute

  FLOPs            = 2 · |out| · kh·kw · Cin/groups
  min HBM bytes    = |lhs| + |rhs| + |out| in their dtypes
  roofline bound   = max(FLOPs / peak_mxu, bytes / peak_hbm_bw)

and measure each distinct conv class on-chip via a dependency-chained
lax.scan (one dispatch for K iterations — the only trustworthy way to time
sub-ms ops through the relay, PERF.md §7; each iteration writes a value
derived from the previous conv's output INTO one operand via an in-place
dynamic_update_slice, a chain XLA can neither fold, factor through the
conv's bilinearity, nor hoist — see _chained_scan_fn for the two broken
generations that forced this design).

v5e-1 peaks: 197 bf16 TFLOP/s (MXU), 819 GB/s HBM.

Usage:
  python scripts/roofline_rn50.py enumerate   # CPU-safe: jaxpr -> shapes json
  python scripts/roofline_rn50.py measure     # on-chip: fills measured ms
  python scripts/roofline_rn50.py report      # PERF.md table + ceiling

Writes data/output/roofline_rn50.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12     # v5e bf16
PEAK_BW = 819e9         # v5e HBM bytes/s
BATCH, IMAGE = 256, 224
# --arch/--kind select the model (default: the RN50 flagship); the
# artifact path follows the tag so DN121 etc. get their own files.
ARCH, KIND, TAG = "resnet", "50", "rn50"
PATH = f"data/output/roofline_{TAG}.json"


def build_step():
    import jax
    import jax.numpy as jnp

    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=KIND, input_size=(3, IMAGE, IMAGE), num_classes=1000,
        batch_size=BATCH, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.0, weight_decay=1e-4,
    )
    model = build_model(ARCH, setting)
    trainer = Trainer(model, use_mesh=False)
    trainer.init_state()
    step = trainer._build_train_step(False, False, False, None, True, False, 0.0)
    return trainer, step


def _nbytes(aval):
    import numpy as np
    return int(np.prod(aval.shape)) * aval.dtype.itemsize


def _nbytes_shape(shape, dtype):
    import numpy as np
    if str(dtype) == "bfloat16":   # plain numpy (report path) lacks it
        itemsize = 2
    else:
        itemsize = np.dtype(dtype).itemsize
    return int(np.prod(shape)) * itemsize


def enumerate_convs():
    """Trace the train step, collect every conv_general_dilated eqn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    trainer, step = build_step()
    x = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.bfloat16)
    y = jnp.zeros((BATCH,), jnp.int32)
    w = jnp.ones((BATCH,), jnp.float32)
    rng = jax.random.key(0)
    jaxpr = jax.make_jaxpr(step)(trainer.state, x, y, w, rng)

    convs = []

    def walk(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                out = eqn.outvars[0].aval
                p = eqn.params
                dn = p["dimension_numbers"]
                # kernel spatial dims + input-feature dim from the dnums
                rhs_spatial = [rhs.shape[d] for d in dn.rhs_spec[2:]]
                rhs_in = rhs.shape[dn.rhs_spec[1]]
                flops = 2.0 * np.prod(out.shape) * np.prod(rhs_spatial) * rhs_in
                # lhs_dilation (stride-2 input-grad convs) inserts zeros
                # between input rows/cols: of the k taps per axis only
                # ~k/d land on real elements (exactly k/d for the k=3,d=2
                # classes here), and XLA's dilated-conv lowering skips the
                # zeros — counting them overstates MACs by prod(d) and
                # made class 4 imply 436 TFLOP/s on a 197 TFLOP/s chip.
                flops /= float(np.prod(p["lhs_dilation"]))
                bytes_ = _nbytes(lhs) + _nbytes(rhs) + _nbytes(out)
                convs.append({
                    "lhs": [list(lhs.shape), str(lhs.dtype)],
                    "rhs": [list(rhs.shape), str(rhs.dtype)],
                    "out": [list(out.shape), str(out.dtype)],
                    "window_strides": list(p["window_strides"]),
                    "padding": [list(q) for q in p["padding"]],
                    "lhs_dilation": list(p["lhs_dilation"]),
                    "rhs_dilation": list(p["rhs_dilation"]),
                    "dn": (tuple(dn.lhs_spec), tuple(dn.rhs_spec),
                           tuple(dn.out_spec)),
                    "groups": int(p["feature_group_count"]),
                    "batch_groups": int(p.get("batch_group_count", 1)),
                    "flops": float(flops),
                    "bytes": float(bytes_),
                })
            for sub in jax.core.jaxprs_in_params(eqn.params):
                walk(sub)

    walk(jaxpr.jaxpr)
    return convs


def classes_of(convs):
    """Group instances into distinct (shape+params) classes with counts."""
    groups = {}
    for c in convs:
        key = json.dumps({k: c[k] for k in (
            "lhs", "rhs", "out", "window_strides", "padding", "lhs_dilation",
            "rhs_dilation", "dn", "groups", "batch_groups")}, sort_keys=True,
            default=list)
        g = groups.setdefault(key, dict(c, count=0))
        g["count"] += 1
    out = []
    for g in groups.values():
        g["t_flops_ms"] = g["flops"] / PEAK_FLOPS * 1e3
        g["t_bw_ms"] = g["bytes"] / PEAK_BW * 1e3
        g["t_bound_ms"] = max(g["t_flops_ms"], g["t_bw_ms"])
        out.append(g)
    out.sort(key=lambda g: -g["flops"] * g["count"])
    return out


def measure_class(cls, iters=None):
    """Time one conv class on-chip: lax.scan with a scalar carry that
    chains iteration i's output into i+1's input (defeats hoisting).

    iters scales inversely with the roofline bound so every class runs
    >=150 ms on device — the ~10 ms relay dispatch then contributes <7%
    even to the smallest classes (a fixed 50 iters leaves a 0.05 ms class
    at 2.5 ms total, i.e. 5x dispatch inflation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    if iters is None:
        iters = min(4000, max(50, int(150.0 / max(cls["t_bound_ms"], 0.005))))
    (lshape, ldt), (rshape, rdt) = cls["lhs"], cls["rhs"]
    lhs = jax.random.uniform(jax.random.key(0), lshape, jnp.float32).astype(ldt)
    rhs = (jax.random.uniform(jax.random.key(1), rshape, jnp.float32) * 0.1).astype(rdt)
    dn = lax.ConvDimensionNumbers(*(tuple(d) for d in cls["dn"]))

    def one_lr(x, w):
        return lax.conv_general_dilated(
            x, w,
            window_strides=tuple(cls["window_strides"]),
            padding=[tuple(p) for p in cls["padding"]],
            lhs_dilation=tuple(cls["lhs_dilation"]),
            rhs_dilation=tuple(cls["rhs_dilation"]),
            dimension_numbers=dn,
            feature_group_count=cls["groups"],
            batch_group_count=cls["batch_groups"],
        )

    fn = _chained_scan_fn(cls, lhs, rhs, one_lr, iters)
    s = fn(jnp.float32(0.0), lhs, rhs)
    _ = np.asarray(s)  # fence (compile + warmup)
    t0 = time.perf_counter()
    s = fn(jnp.float32(0.0), lhs, rhs)
    _ = np.asarray(s)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, iters


def _chained_scan_fn(cls, lhs, rhs, one_lr, iters):
    """Build the dependency-chained timing loop for one conv class.

    The chain must be one XLA provably cannot remove. Two broken
    generations taught us what that takes:
      gen 1: `lhs * (1 + s*0.0)` — s*0.0 folds to 0, the conv goes
             loop-invariant and is hoisted (class 1 implied 780 TFLOP/s).
      gen 2: `rhs * (1 + s*1e-30)` — the scale is a real runtime value,
             but convolution is BILINEAR, so the TPU pipeline rewrites
             conv(lhs, rhs*eps) -> conv(lhs, rhs)*eps, hoists the conv,
             and with only y[0] live the loop body degenerates to scalar
             arithmetic (re-measure implied 950+ TFLOP/s, 5x v5e peak).
    gen 3: the smaller operand travels as a LOOP CARRY and each
    iteration writes `orig0 + s*1e-30` into its element [0] via
    dynamic_update_slice, chaining through `y.reshape(-1)[0]`. The input
    side held, but the OUTPUT side was dead: with a single output element
    live, the TPU pipeline narrows the conv to (effectively) that one
    element's window dot — on-chip class 1 measured 0.064 ms, implied
    930 TFLOP/s, caught by the guard. Lesson: the chain must keep every
    output element live, not just reach through one.
    gen 4 (this): same loop-variant DUS perturbation on the carried
    operand, but the carry scalar is now `sum(y*y)` over the ENTIRE
    output in f32. Sum-of-squares is non-linear in y, so no bilinearity
    identity can collapse it (a plain `sum(y)` is itself a linear
    functional of each operand and could in principle be rewritten as a
    cheap marginal contraction — don't use it), and every output element
    is live, so the full conv must execute every iteration. The epilogue
    costs one fused square+reduce pass over the output — bounded by the
    out-write bytes already counted in t_bw, i.e. at most ~2x on a
    pure-output-bandwidth class and noise on every flop-bound one.
    s*1e-30 keeps the perturbation ~1 ulp (value unchanged in fp32/bf16).
    cmd_measure additionally rejects any timing whose implied TFLOP/s
    exceeds the chip peak — the invariant every broken generation violated.

    The operands are jit ARGUMENTS, not closure captures: captured arrays
    are embedded as constants in the compile request, and the relay caps
    the request body — the 50–200 MB activation-grad operands of the
    weight-gradient classes blew it up (HTTP 413 at RN50 class 29 /
    DN121 class 11 on both earlier runs).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    lshape, rshape = lhs.shape, rhs.shape
    chain_rhs = _nbytes_shape(rshape, rhs.dtype) <= _nbytes_shape(lshape, lhs.dtype)

    def run(s, lhs, rhs):
        buf0 = rhs if chain_rhs else lhs
        orig0 = buf0.reshape(-1)[0].astype(jnp.float32)

        def body(carry, _):
            s, buf = carry
            upd = (orig0 + s * 1e-30).astype(buf.dtype).reshape((1,) * buf.ndim)
            buf = lax.dynamic_update_slice(buf, upd, (0,) * buf.ndim)
            y = one_lr(lhs, buf) if chain_rhs else one_lr(buf, rhs)
            # every output element live, non-linearly (see docstring):
            yf = y.astype(jnp.float32)
            return (jnp.sum(yf * yf), buf), None

        return lax.scan(body, (s, buf0), None, length=iters)[0][0]

    return jax.jit(run)


def cmd_enumerate():
    # tracing only — run on CPU so this never touches the axon chip
    # (launch with PALLAS_AXON_POOL_IPS= to skip the TPU claim entirely)
    import jax
    jax.config.update("jax_platforms", "cpu")
    convs = enumerate_convs()
    classes = classes_of(convs)
    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    with open(PATH, "w") as f:
        json.dump({"batch": BATCH, "image": IMAGE,
                   "num_instances": len(convs), "classes": classes}, f, indent=1)
    tot_f = sum(g["flops"] * g["count"] for g in classes)
    tot_b = sum(g["t_bound_ms"] * g["count"] for g in classes)
    print(f"{len(convs)} conv instances in {len(classes)} classes; "
          f"{tot_f / 1e12:.2f} TFLOP/step; roofline sum {tot_b:.1f} ms "
          f"(MXU-only {tot_f / PEAK_FLOPS * 1e3:.1f} ms)")


def implied_tflops(cls, ms):
    """Compute rate a timing implies for this class, in TFLOP/s."""
    return cls["flops"] / (ms * 1e-3) / 1e12


def cmd_measure(top=None):
    with open(PATH) as f:
        rec = json.load(f)
    classes = rec["classes"][:int(top)] if top else rec["classes"]
    for i, cls in enumerate(classes):
        if "t_measured_ms" in cls:
            continue  # resume across relay wedges
        ms, iters = measure_class(cls)
        cls["t_measured_ms"] = round(ms, 4)
        cls["t_measured_iters"] = iters
        # Physical-impossibility guard: both broken chain generations
        # (see _chained_scan_fn) produced timings whose implied compute
        # rate exceeded the chip's peak. Never record such a number as
        # a plain measurement again.
        implied = implied_tflops(cls, ms)
        if implied > 1.15 * PEAK_FLOPS / 1e12:
            cls["t_measured_invalid_tflops"] = round(implied, 1)
            print(f"[{i + 1}/{len(classes)}] INVALID measurement: "
                  f"{ms:.3f} ms implies {implied:.0f} TFLOP/s "
                  f"> peak {PEAK_FLOPS / 1e12:.0f} — dependency chain "
                  f"defeated again; aborting", flush=True)
            with open(PATH, "w") as f:
                json.dump(rec, f, indent=1)
            raise SystemExit(2)
        print(f"[{i + 1}/{len(classes)}] "
              f"lhs={cls['lhs'][0]} rhs={cls['rhs'][0]} x{cls['count']}: "
              f"{ms:.3f} ms (bound {cls['t_bound_ms']:.3f}, {iters} it)",
              flush=True)
        with open(PATH, "w") as f:
            json.dump(rec, f, indent=1)


def cmd_report():
    with open(PATH) as f:
        rec = json.load(f)
    rows = rec["classes"]
    print("| lhs | rhs | s | g | n | TFLOP | t_mxu | t_hbm | bound | meas | x |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    tot_bound = tot_meas = 0.0
    for g in rows:
        meas = g.get("t_measured_ms")
        n = g["count"]
        tot_bound += g["t_bound_ms"] * n
        tot_meas += (meas or 0.0) * n
        ratio = f"{meas / g['t_bound_ms']:.2f}" if meas else "-"
        print(f"| {g['lhs'][0]} | {g['rhs'][0]} | {g['window_strides']} "
              f"| {g['groups']} | {n} | {g['flops'] * n / 1e12:.2f} "
              f"| {g['t_flops_ms']:.3f} | {g['t_bw_ms']:.3f} "
              f"| {g['t_bound_ms']:.3f} | {meas if meas else '-'} | {ratio} |")
    print(f"\nTOTAL roofline bound {tot_bound:.1f} ms; measured conv-only "
          f"{tot_meas:.1f} ms; attainable img/s at bound "
          f"{BATCH / tot_bound * 1e3:.0f} (convs alone)")

    # VERDICT r4 #6: layers measured >30% above their roofline bound are
    # the concrete headroom list; everything else is compiler-optimal.
    # The hotspot filter uses an epilogue-adjusted bound: the gen-4 timer
    # consumes sum(y*y) over the whole output, which re-reads the output
    # once — a real extra out_bytes of HBM traffic in the measured loop
    # that the pure-conv bound does not contain. Judging against the raw
    # bound would flag small bandwidth-bound classes as hotspots for
    # traffic the measurement construction itself added.
    def adj_bound(g):
        out_b = _nbytes_shape(g["out"][0], g["out"][1])
        return max(g["t_flops_ms"],
                   (g["bytes"] + out_b) / PEAK_BW * 1e3)

    hot = [g for g in rows if g.get("t_measured_ms")
           and g["t_measured_ms"] > 1.3 * adj_bound(g)]
    hot.sort(key=lambda g: -(g["t_measured_ms"] - g["t_bound_ms"]) * g["count"])
    print(f"\n{len(hot)}/{len(rows)} classes >30% above bound "
          f"(by count-weighted excess ms):")
    for g in hot[:15]:
        ex = (g["t_measured_ms"] - g["t_bound_ms"]) * g["count"]
        print(f"  lhs={g['lhs'][0]} rhs={g['rhs'][0]} s={g['window_strides']} "
              f"x{g['count']}: {g['t_measured_ms']:.3f} ms vs bound "
              f"{g['t_bound_ms']:.3f} ({g['t_measured_ms'] / g['t_bound_ms']:.2f}x) "
              f"-> {ex:.2f} ms/step excess")
    if tot_meas:
        # Environment ceiling: replace measured conv time with the bound,
        # keep the measured non-conv remainder of the real step.
        step_ms = float(os.environ.get("ROOFLINE_STEP_MS", "0")) or None
        if step_ms:
            nonconv = step_ms - tot_meas
            ceil_ms = tot_bound + max(nonconv, 0.0)
            print(f"\nstep {step_ms:.1f} ms = conv {tot_meas:.1f} + nonconv "
                  f"{nonconv:.1f}; at roofline the same step is {ceil_ms:.1f} ms "
                  f"-> ceiling {BATCH / ceil_ms * 1e3:.0f} img/s "
                  f"(measured {BATCH / step_ms * 1e3:.0f})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    ARCH = kv.get("arch", ARCH)
    KIND = kv.get("kind", KIND)
    TAG = kv.get("tag", f"{ARCH.replace('net', '')}{KIND}"
                 if "arch" in kv or "kind" in kv else TAG)
    PATH = f"data/output/roofline_{TAG}.json"
    cmd = args[0] if args else "enumerate"
    if cmd == "measure":
        cmd_measure(top=kv.get("top"))
    else:
        {"enumerate": cmd_enumerate, "report": cmd_report}[cmd]()
