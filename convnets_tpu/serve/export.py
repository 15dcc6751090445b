"""AOT serving export built on `jax.export`.

What gets exported: the eval-mode forward (`module.apply(..., train=False)`
— inference BN, no dropout) with the trained variables embedded in the
program as constants, an optional baked-in input normalization, and fp32
logits (optionally softmax probabilities) out. The batch dimension is
symbolic by default, so ONE artifact serves any batch size; XLA
specializes per concrete batch at call time.

Artifact layout (single file)::

    CONVNETS_TPU_EXPORT\\x00 | u32 meta_len | meta json (utf-8) | payload

where payload is ``jax.export.Exported.serialize()`` bytes. The metadata
carries the model identity, input contract, and class names so a serving
host can validate requests without the training config.

Reference slots this replaces/extends: checkpoint reload before serving
(`/root/reference/src/basemodel.py:897-948`), ``inference_time``
(`basemodel.py:579-599`) and the timed ``test`` benchmark
(`basemodel.py:601-722`) — all of which require the live torch model.
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.export as jex
import jax.numpy as jnp
import numpy as np

_MAGIC = b"CONVNETS_TPU_EXPORT\x00"
_DEFAULT_PLATFORMS = ("tpu", "cpu")


def _serving_forward(model, variables, output: str,
                     stats: Optional[Tuple[np.ndarray, np.ndarray]],
                     input_dtype: str = "float32"):
    """Closure the exported program is traced from: variables become
    embedded constants; input is NHWC — fp32 in [0,1], or raw uint8
    pixels (the wire format for image serving: 4x fewer host→device
    bytes, dequantization baked into the graph) — logits come back fp32."""
    compute_dtype = model.policy.compute_dtype
    if stats is not None:
        mean = jnp.asarray(np.asarray(stats[0]).reshape(1, 1, 1, -1),
                           jnp.float32)
        std = jnp.asarray(np.asarray(stats[1]).reshape(1, 1, 1, -1),
                          jnp.float32)
    else:
        mean = std = None

    def forward(x):
        x = x.astype(jnp.float32)
        if input_dtype == "uint8":
            x = x * (1.0 / 255.0)
        if mean is not None:
            x = (x - mean) / std
        y, _ = model.module.apply(variables, x.astype(compute_dtype),
                                  train=False)
        y = y.astype(jnp.float32)
        if output == "probs":
            y = jax.nn.softmax(y, axis=-1)
        return y

    return forward


def export_model(model, variables, *, batch_size: Optional[int] = None,
                 output: str = "logits",
                 stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 input_dtype: str = "float32",
                 platforms: Sequence[str] = _DEFAULT_PLATFORMS):
    """Export the eval forward as a `jax.export.Exported`.

    batch_size None → symbolic batch dim (artifact serves any batch).
    output: "logits" (fp32) or "probs" (softmax).
    stats: optional (mean, std) per-channel arrays baked into the graph
      (the dataset normalization the reference applies host-side,
      `mngrdata.py:61-72` — served requests then send raw pixels).
    input_dtype: "float32" ([0,1] pixels) or "uint8" (raw bytes on the
      wire, /255 dequantization in-graph — 4x fewer host→device bytes;
      with stats, normalization composes after the dequant).
    """
    if output not in ("logits", "probs"):
        raise ValueError(f"output must be 'logits' or 'probs', got {output!r}")
    if input_dtype not in ("float32", "uint8"):
        raise ValueError(f"input_dtype must be 'float32' or 'uint8', "
                         f"got {input_dtype!r}")
    _, h, w = model.setting.input_size  # CHW, reference convention
    c = model.setting.input_size[0]
    if batch_size is None:
        (b,) = jex.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct(
        (b, h, w, c),
        jnp.uint8 if input_dtype == "uint8" else jnp.float32)
    fwd = _serving_forward(model, variables, output, stats, input_dtype)
    return jex.export(jax.jit(fwd), platforms=list(platforms))(spec)


def _metadata(model, *, output: str, batch_size, platforms,
              class_names=None, stats=None,
              input_dtype: str = "float32") -> dict:
    return {
        "format": 1,
        "model_name": model.model_name,
        "arch_kind": str(model.setting.kind),
        "input_size_chw": list(model.setting.input_size),
        "input_layout": "NHWC",
        "input_dtype": input_dtype,
        "num_classes": int(model.setting.num_classes),
        "output": output,
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "platforms": list(platforms),
        "normalization_baked": stats is not None,
        "class_names": list(class_names) if class_names else None,
        "jax_version": jax.__version__,
    }


def save_artifact(path: str, model, variables, *,
                  batch_size: Optional[int] = None,
                  output: str = "logits",
                  stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                  class_names: Optional[Sequence[str]] = None,
                  input_dtype: str = "float32",
                  platforms: Sequence[str] = _DEFAULT_PLATFORMS) -> dict:
    """Export + write the single-file artifact. Returns the metadata."""
    exported = export_model(model, variables, batch_size=batch_size,
                            output=output, stats=stats,
                            input_dtype=input_dtype, platforms=platforms)
    meta = _metadata(model, output=output, batch_size=batch_size,
                     platforms=platforms, class_names=class_names,
                     stats=stats, input_dtype=input_dtype)
    blob = bytes(exported.serialize())
    meta_bytes = json.dumps(meta).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    import os

    os.replace(tmp, path)  # atomic publish, same discipline as checkpoints
    return meta


class ServingModel:
    """A deserialized artifact: ``__call__`` runs the exported program
    (jitted — XLA specializes per concrete batch under a symbolic export),
    ``predict`` returns class indices (or names when bundled)."""

    def __init__(self, exported: "jex.Exported", meta: dict):
        self.exported = exported
        self.meta = meta
        self._call = jax.jit(exported.call)

    def __call__(self, x):
        wire = jnp.uint8 if self.meta.get("input_dtype") == "uint8" \
            else jnp.float32
        x = jnp.asarray(x, wire)
        if x.ndim == 3:
            x = x[None]
        return self._call(x)

    def predict(self, x):
        idx = np.asarray(jnp.argmax(self(x), axis=-1))
        names = self.meta.get("class_names")
        if names:
            return [names[i] for i in idx]
        return idx


def load_artifact(path: str) -> ServingModel:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a convnets_tpu export artifact")
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        blob = f.read()
    return ServingModel(jex.deserialize(bytearray(blob)), meta)


def export_trainer(trainer, path: str, *,
                   batch_size: Optional[int] = None,
                   output: str = "logits",
                   stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                   class_names: Optional[Sequence[str]] = None,
                   input_dtype: str = "float32",
                   platforms: Sequence[str] = _DEFAULT_PLATFORMS) -> dict:
    """Export a Trainer's current (typically checkpoint-loaded) state."""
    variables = {"params": trainer.state.params,
                 "state": trainer.state.model_state}
    names = class_names if class_names is not None else \
        getattr(trainer, "class_names", None)
    return save_artifact(path, trainer.model, variables,
                         batch_size=batch_size, output=output, stats=stats,
                         class_names=names, input_dtype=input_dtype,
                         platforms=platforms)
