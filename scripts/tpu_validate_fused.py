"""On-chip validation + timing of the fused/grouped Pallas kernels.

Parity (fp32, Mosaic lowering — interpret-mode parity already covered in
tests/test_pallas.py) and step-time A/B of the RN26/RN50 train step with
CONVNETS_TPU_PALLAS on/off. Run ONE at a time on the axon chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def parity():
    from convnets_tpu import ops
    from convnets_tpu.ops import pallas as P

    rep = {}
    x = jax.random.normal(jax.random.key(0), (32, 32, 32, 64), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 64, 64), jnp.float32) * 0.1

    y, s1, s2 = P.conv2d_stats(x, w, stride=1, padding=1)
    want = ops.conv2d(x, w, stride=1, padding=1)
    rep["conv2d_stats_y"] = float(jnp.max(jnp.abs(y - want)))
    wf = np.asarray(want, np.float64)
    rep["conv2d_stats_s1"] = float(np.max(np.abs(np.asarray(s1) - wf.sum((0, 1, 2)))
                                          / (np.abs(wf.sum((0, 1, 2))) + 1)))
    rep["conv2d_stats_s2"] = float(np.max(np.abs(np.asarray(s2) - (wf * wf).sum((0, 1, 2)))
                                          / ((wf * wf).sum((0, 1, 2)) + 1)))

    gamma = jnp.ones((64,)) * 1.2
    beta = jnp.ones((64,)) * 0.1
    out, mean, var = P.conv_bn_relu_train(x, w, gamma, beta, 1, 1, 1, 1e-5, True)
    yy = ops.conv2d(x, w, stride=1, padding=1)
    o2, _, _ = ops.batch_norm_train(yy, jnp.zeros((64,)), jnp.ones((64,)), gamma, beta)
    o2 = ops.relu(o2)
    rep["fused_bn_out"] = float(jnp.max(jnp.abs(out - o2)))

    # grouped: ResNeXt cardinality-32 shape
    xg = jax.random.normal(jax.random.key(2), (32, 16, 16, 128), jnp.float32)
    wg = jax.random.normal(jax.random.key(3), (3, 3, 4, 128), jnp.float32) * 0.1
    got = P.grouped_conv2d_train(xg, wg, 32, 1, 1)
    wantg = ops.conv2d(xg, wg, stride=1, padding=1, groups=32)
    rep["grouped_out"] = float(jnp.max(jnp.abs(got - wantg)))

    # stride-2 fused
    y2, s21, _ = P.conv2d_stats(x, w, stride=2, padding=1)
    want2 = ops.conv2d(x, w, stride=2, padding=1)
    rep["conv2d_stats_s2ride"] = float(jnp.max(jnp.abs(y2 - want2)))

    # pool train fwd
    pt = P.pool2d_train(x, "max", 3, 2, 1)
    rep["pool_max"] = float(jnp.max(jnp.abs(pt - ops.max_pool2d(x, 3, 2, 1))))
    return rep


def step_time(kind, image, batch, steps=20, warmup=5):
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind=kind, input_size=(3, image, image), num_classes=1000 if image > 64 else 10,
        batch_size=batch, mixed_precision=True, data_augment=False,
        data_norm=False, dropout_rate=0.0, weight_decay=1e-4,
    )
    model = build_model("resnet", setting)
    trainer = Trainer(model)
    trainer.init_state()
    fn = trainer._get_train_step(augment=False, norm=False)
    x = jax.random.uniform(jax.random.key(0), (batch, image, image, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, setting.num_classes, jnp.int32)
    wv = jnp.ones((batch,), jnp.float32)
    state = trainer.state
    for i in range(warmup):
        state, loss, c = fn(state, x, y, wv, jax.random.fold_in(jax.random.key(2), i))
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, c = fn(state, x, y, wv, jax.random.fold_in(jax.random.key(3), i))
    _ = np.asarray(loss)
    dt = (time.perf_counter() - t0) / steps
    return dt * 1000.0, batch / dt


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        print(json.dumps(parity(), indent=2))
    else:
        kind, image, batch = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        ms, fps = step_time(kind, image, batch)
        print(json.dumps({
            "kind": kind, "image": image, "batch": batch,
            "pallas": os.environ.get("CONVNETS_TPU_PALLAS", "0"),
            "s2d": os.environ.get("CONVNETS_TPU_S2D", "1"),
            "step_ms": round(ms, 2), "img_per_s": round(fps, 1),
        }))
