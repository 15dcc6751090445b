"""Losses and scoring.

Matches the reference's nn.CrossEntropyLoss(reduction='sum')
(basemodel.py:46) with the epoch-level divide-by-dataset-size convention
(basemodel.py:299-300): per-batch loss is a SUM over examples; the engine
divides the accumulated sum by len(dataset), i.e. a mean over the dataset,
not over batches. Always computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_sum(logits, labels, weights=None, label_smoothing=0.0):
    """Sum of per-example CE. logits (N, C) any float dtype, labels (N,) int.

    weights: optional (N,) 0/1 mask — used to ignore padding examples in the
    last partial batch of a jitted epoch loop.
    label_smoothing: optional ε — targets become (1-ε)·onehot + ε/C (the
    torch CrossEntropyLoss(label_smoothing=ε) convention); 0.0 reproduces
    the reference's plain CE exactly.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing:
        eps = float(label_smoothing)
        nll = (1.0 - eps) * nll + eps * (-jnp.mean(logp, axis=-1))
    if weights is not None:
        nll = nll * weights.astype(jnp.float32)
    return jnp.sum(nll)


def correct_count(logits, labels, weights=None):
    """Number of correct argmax predictions (reference score(), basemodel.py:111-128)."""
    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == labels).astype(jnp.float32)
    if weights is not None:
        correct = correct * weights.astype(jnp.float32)
    return jnp.sum(correct)
