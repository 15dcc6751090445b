"""Profile the ResNet-50/224 train step on the real chip and emit the
per-op cost table for PERF.md (r2 VERDICT next-steps #2).

Two instruments:
  1. jax.profiler.trace over fenced steps → parse the device XPlane
     (tensorboard_plugin_profile protos) → per-op-category time table.
  2. Ablation ladder: eval fwd → train fwd → +bwd → +BN → full step at
     several batch sizes — measured step times that bound each component
     (D2H-fenced; block_until_ready returns early through the tunnel).

Usage: python scripts/profile_rn50.py [--trace-dir /tmp/rn50_trace]
Writes data/output/profile_rn50.json; PERF.md is assembled from it.
"""

import argparse
import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(batch, image, kind="50", arch="resnet", optimizer=None):
    import jax
    import jax.numpy as jnp

    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=kind, input_size=(3, image, image), num_classes=1000,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.5, weight_decay=1e-4,
    )
    model = build_model(arch, setting)
    trainer = Trainer(model, optimizer=optimizer)
    trainer.init_state()
    step_fn = trainer._get_train_step(augment=False, norm=False)
    eval_fn = trainer._get_eval_step(norm=False)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000, jnp.int32)
    w = jnp.ones((batch,), jnp.float32)
    return trainer, step_fn, eval_fn, (x, y, w), key


def timed_train(trainer, step_fn, batch_data, steps=20, warmup=5):
    import jax
    import numpy as np

    x, y, w = batch_data
    key = jax.random.key(7)
    state = trainer.state
    loss = None
    for i in range(warmup):
        state, loss, _ = step_fn(state, x, y, w, jax.random.fold_in(key, i))
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, _ = step_fn(state, x, y, w, jax.random.fold_in(key, 99 + i))
    _ = np.asarray(loss)
    dt = (time.perf_counter() - t0) / steps
    trainer.state = state
    return dt


def timed_eval(trainer, eval_fn, batch_data, steps=20, warmup=5):
    import numpy as np

    x, y, w = batch_data
    out = None
    for _ in range(warmup):
        out = eval_fn(trainer.state, x, y, w)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = eval_fn(trainer.state, x, y, w)
    _ = np.asarray(out[0])
    return (time.perf_counter() - t0) / steps


def parse_xplane(trace_dir):
    """Aggregate device-plane op times by op category and by op name."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # plugin layout differs across tb versions
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        return None
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    result = {"planes": [p.name for p in space.planes]}
    for plane in space.planes:
        lname = plane.name.lower()
        if "tpu" not in lname and "device" not in lname:
            continue
        meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        by_name = defaultdict(float)
        by_cat = defaultdict(float)
        for line in plane.lines:
            if "xla op" not in line.name.lower() and "ops" not in line.name.lower():
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                dur_ms = ev.duration_ps / 1e9
                by_name[name] += dur_ms
                cat = None
                for st in ev.stats:
                    sm = stats_meta.get(st.metadata_id)
                    if sm and sm.name in ("equation", "hlo_category", "category"):
                        cat = st.str_value or None
                for st in (m.stats if m else []):
                    sm = stats_meta.get(st.metadata_id)
                    if sm and sm.name in ("hlo_category", "category"):
                        cat = st.str_value or cat
                by_cat[cat or _guess_category(name)] += dur_ms
        if by_name:
            result.setdefault("devices", {})[plane.name] = {
                "by_category_ms": dict(sorted(by_cat.items(),
                                              key=lambda kv: -kv[1])),
                "top_ops_ms": dict(sorted(by_name.items(),
                                          key=lambda kv: -kv[1])[:40]),
            }
    return result


def _guess_category(name):
    n = name.lower()
    if "conv" in n:
        return "convolution"
    if "dot" in n:
        return "dot"
    if any(k in n for k in ("fusion", "fused")):
        return "fusion"
    if any(k in n for k in ("copy", "transpose", "reshape", "bitcast")):
        return "data-movement"
    if any(k in n for k in ("all-reduce", "reduce")):
        return "reduce"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/rn50_trace")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--kind", default="50")
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--out", default="data/output/profile_rn50.json")
    ap.add_argument("--skip-ablation", action="store_true")
    ap.add_argument("--skip-batch-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    report = {"device": str(jax.devices()[0])}

    # ---- ablation ladder ---------------------------------------------------
    if not args.skip_ablation:
        lad = {}
        trainer, step_fn, eval_fn, data, _ = build_step(
            args.batch, args.image, kind=args.kind, arch=args.arch)
        lad["eval_fwd_ms"] = round(timed_eval(trainer, eval_fn, data) * 1e3, 2)
        lad["train_full_ms"] = round(timed_train(trainer, step_fn, data) * 1e3, 2)
        lad["train_img_s"] = round(args.batch / (lad["train_full_ms"] / 1e3), 1)
        if not args.skip_batch_sweep:
            # SGD variant: bounds the Adam-moments cost
            tr2, sf2, _, d2, _ = build_step(args.batch, args.image,
                                            kind=args.kind, arch=args.arch,
                                            optimizer="sgd")
            lad["train_full_sgd_ms"] = round(timed_train(tr2, sf2, d2) * 1e3, 2)
            del tr2, sf2, d2
            # batch scaling
            for b in (512, 128):
                try:
                    trb, sfb, _, db, _ = build_step(b, args.image,
                                                    kind=args.kind,
                                                    arch=args.arch)
                    ms = timed_train(trb, sfb, db, steps=10) * 1e3
                    lad[f"train_b{b}_ms"] = round(ms, 2)
                    lad[f"train_b{b}_img_s"] = round(b / (ms / 1e3), 1)
                    del trb, sfb, db
                except Exception as e:
                    lad[f"train_b{b}_error"] = str(e)[:120]
        report["ablation"] = lad
        print(json.dumps(lad), flush=True)

    # ---- device trace ------------------------------------------------------
    trainer, step_fn, eval_fn, data, _ = build_step(
        args.batch, args.image, kind=args.kind, arch=args.arch)
    x, y, w = data
    key = jax.random.key(3)
    state = trainer.state
    for i in range(5):
        state, loss, _ = step_fn(state, x, y, w, jax.random.fold_in(key, i))
    _ = np.asarray(loss)
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(10):
            state, loss, _ = step_fn(state, x, y, w,
                                     jax.random.fold_in(key, 50 + i))
        _ = np.asarray(loss)
    try:
        parsed = parse_xplane(args.trace_dir)
        report["trace"] = parsed
        if parsed and "devices" in parsed:
            for dev, t in parsed["devices"].items():
                print(dev, json.dumps(t["by_category_ms"]), flush=True)
        else:
            print("no device plane captured; planes:",
                  parsed and parsed.get("planes"), flush=True)
    except Exception as e:
        report["trace_error"] = f"{type(e).__name__}: {e}"
        print("trace parse failed:", e, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
