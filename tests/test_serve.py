"""Serving/export tests: AOT StableHLO artifact roundtrip.

Covers convnets_tpu.serve — the deployment step past the reference's
checkpoint-reload serving story (basemodel.py:897-948): export the
eval-mode forward with embedded weights, write/read the single-file
artifact, and verify the deserialized program reproduces the live
model bit-for-bit with NO model object in the loop.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnets_tpu.models import build_model
from convnets_tpu.serve import (
    export_model,
    load_artifact,
    save_artifact,
)
from convnets_tpu.settings import Settings


def _tiny_model(mixed=False):
    setting = Settings(
        kind="0", input_size=(3, 16, 16), num_classes=4, batch_size=4,
        mixed_precision=mixed, data_augment=False, data_norm=False,
        dropout_rate=0.5,
    )
    model = build_model("lenet", setting)
    variables = model.init(batch_size=4)
    return model, variables


def test_export_roundtrip_matches_live_apply(tmp_path):
    model, variables = _tiny_model()
    x = np.random.RandomState(0).rand(4, 16, 16, 3).astype(np.float32)
    live, _ = model.apply(variables, jnp.asarray(x), train=False)

    path = str(tmp_path / "lenet.cnx")
    meta = save_artifact(path, model, variables, batch_size=4,
                         class_names=["a", "b", "c", "d"])
    assert meta["batch"] == 4 and meta["output"] == "logits"
    assert os.path.exists(path)

    served = load_artifact(path)
    out = served(x)
    # identical program, identical constants → exact equality expected,
    # but allow float noise from independent lowering runs
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-5, atol=1e-5)
    assert served.predict(x) == [
        ["a", "b", "c", "d"][i] for i in np.argmax(np.asarray(live), axis=-1)
    ]


def test_symbolic_batch_serves_any_size(tmp_path):
    model, variables = _tiny_model()
    path = str(tmp_path / "lenet_sym.cnx")
    meta = save_artifact(path, model, variables)  # batch_size=None
    assert meta["batch"] == "symbolic"
    served = load_artifact(path)
    rng = np.random.RandomState(1)
    for b in (1, 3, 7):
        x = rng.rand(b, 16, 16, 3).astype(np.float32)
        live, _ = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(served(x)), np.asarray(live),
                                   rtol=1e-5, atol=1e-5)
    # single-image convenience: rank-3 input gets a batch dim
    assert served(rng.rand(16, 16, 3).astype(np.float32)).shape == (1, 4)


def test_probs_output_and_baked_normalization(tmp_path):
    model, variables = _tiny_model()
    mean = np.array([0.4, 0.5, 0.45], np.float32)
    std = np.array([0.2, 0.25, 0.3], np.float32)
    path = str(tmp_path / "lenet_probs.cnx")
    save_artifact(path, model, variables, batch_size=2, output="probs",
                  stats=(mean, std))
    served = load_artifact(path)
    assert served.meta["normalization_baked"] is True

    x = np.random.RandomState(2).rand(2, 16, 16, 3).astype(np.float32)
    xn = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
    live, _ = model.apply(variables, jnp.asarray(xn), train=False)
    want = jax.nn.softmax(live, axis=-1)
    got = served(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, rtol=1e-5)


def test_uint8_wire_format(tmp_path):
    """uint8 artifact: raw bytes in, /255 dequant (+ norm) in-graph —
    must match the fp32 path fed the same pixels."""
    model, variables = _tiny_model()
    mean = np.array([0.4, 0.5, 0.45], np.float32)
    std = np.array([0.2, 0.25, 0.3], np.float32)
    path = str(tmp_path / "lenet_u8.cnx")
    save_artifact(path, model, variables, batch_size=2, stats=(mean, std),
                  input_dtype="uint8")
    served = load_artifact(path)
    assert served.meta["input_dtype"] == "uint8"

    xb = np.random.RandomState(6).randint(0, 256, (2, 16, 16, 3),
                                          dtype=np.uint8)
    xf = xb.astype(np.float32) / 255.0
    xn = (xf - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
    live, _ = model.apply(variables, jnp.asarray(xn), train=False)
    np.testing.assert_allclose(np.asarray(served(xb)), np.asarray(live),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="input_dtype"):
        export_model(model, variables, batch_size=2, input_dtype="int8")


def test_export_dropout_is_inert_and_bf16_policy_exports(tmp_path):
    # mixed-precision model: exported program must carry the bf16 compute
    # policy; eval-mode dropout must be a no-op (deterministic output)
    model, variables = _tiny_model(mixed=True)
    exported = export_model(model, variables, batch_size=2)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 3), jnp.float32)
    a = np.asarray(jax.jit(exported.call)(x))
    b = np.asarray(jax.jit(exported.call)(x))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32  # logits come back fp32 regardless of policy


def test_export_trainer_from_checkpoint(tmp_path):
    """The deployment path end-to-end: train briefly → checkpoint →
    fresh Trainer loads it → export → served output matches the live
    checkpointed model."""
    from convnets_tpu.data.datasets import synthetic_dataset
    from convnets_tpu.data.loader import DataLoader
    from convnets_tpu.serve import export_trainer
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind="0", input_size=(3, 16, 16), num_classes=4, batch_size=8,
        epochs=1, mixed_precision=False, data_augment=False, data_norm=False,
        early_stop=False, lr_scheduler="none",
        output_dir=str(tmp_path / "out"),
    )
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    ds = synthetic_dataset(16, image_shape=(16, 16, 3), num_classes=4)
    trainer.fit(DataLoader(ds, 8, shuffle=False),
                DataLoader(ds, 8, shuffle=False))

    model2 = build_model("lenet", setting)
    trainer2 = Trainer(model2)
    trainer2.load_checkpoint()

    path = str(tmp_path / "ckpt_export.cnx")
    export_trainer(trainer2, path, batch_size=4)
    served = load_artifact(path)

    x = np.random.RandomState(4).rand(4, 16, 16, 3).astype(np.float32)
    live, _ = model2.apply(
        {"params": trainer2.state.params, "state": trainer2.state.model_state},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(served(x)), np.asarray(live),
                               rtol=1e-5, atol=1e-5)


def test_process_export_driver(tmp_path, capsys):
    """CLI-level driver: checkpoint on disk → artifact on disk."""
    from convnets_tpu.data.datasets import synthetic_dataset
    from convnets_tpu.data.loader import DataLoader
    from convnets_tpu.drivers import process_export
    from convnets_tpu.train.engine import Trainer

    setting = Settings(
        kind="0", input_size=(3, 16, 16), num_classes=4, batch_size=8,
        epochs=1, mixed_precision=False, data_augment=False, data_norm=False,
        early_stop=False, lr_scheduler="none",
        output_dir=str(tmp_path / "out"),
    )
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    ds = synthetic_dataset(16, image_shape=(16, 16, 3), num_classes=4)
    trainer.fit(DataLoader(ds, 8, shuffle=False),
                DataLoader(ds, 8, shuffle=False))

    out = str(tmp_path / "driver_export.cnx")
    meta = process_export("lenet", setting, out_path=out, serve_batch=2,
                          output="probs")
    assert meta["output"] == "probs" and os.path.exists(out)
    assert "exported" in capsys.readouterr().out
    served = load_artifact(out)
    x = np.random.RandomState(5).rand(2, 16, 16, 3).astype(np.float32)
    assert np.asarray(served(x)).shape == (2, 4)


def test_load_rejects_non_artifact(tmp_path):
    p = tmp_path / "junk.cnx"
    p.write_bytes(b"definitely not an artifact")
    with pytest.raises(ValueError, match="not a convnets_tpu export"):
        load_artifact(str(p))
