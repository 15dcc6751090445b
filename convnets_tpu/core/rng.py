"""PRNG plumbing.

Replaces the reference's global-seed reproducibility switch
(/root/reference/src/mngrutility.py:26-59, which seeds numpy/random/torch/cuda)
with explicit JAX PRNG keys: one root key per run, folded per purpose
(init / dropout / data order / augmentation), which is deterministic by
construction — the TPU-native equivalent of "reproducible mode".
"""

from __future__ import annotations

import random

import jax
import numpy as np

# Stable stream tags: fold_in(key, _STREAM[name]) gives independent,
# reproducible substreams from a single seed.
_STREAMS = {
    "init": 0,
    "dropout": 1,
    "data": 2,
    "augment": 3,
    "tune": 4,
    "bench": 5,
    "bn_reestimate": 6,
    "eval": 7,
}


def key_for(seed: int, stream: str, *extra: int) -> jax.Array:
    """Derive the PRNG key for a named stream (plus optional indices)."""
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, _STREAMS[stream])
    for e in extra:
        key = jax.random.fold_in(key, e)
    return key


def hw_dropout_key(key: jax.Array) -> jax.Array:
    """Rewrap a threefry key as an `unsafe_rbg` key for dropout masks.

    Threefry bernoulli costs ~20 rounds of int32 arithmetic per element; on
    DenseNet-121@224 (which applies dropout inside every dense layer,
    reference densenet.py:105-140 — ~120 masks/step over the fattest
    activations in the zoo) that is 250 ms of a 391 ms step. `unsafe_rbg`
    lowers to XLA's RngBitGenerator (the TPU hardware RNG instruction):
    measured 390.9 → 217.4 ms (data/output/dn121_dropout_ab.json). Dropout
    needs per-step statistical independence, not threefry's counter-based
    splittability guarantees, so the "unsafe" derivation is fine here.

    The rbg key data is derived deterministically from the threefry key, so
    runs remain reproducible per seed. Only the dropout stream is rewrapped —
    init/augment/data keys stay threefry and published-run reproducibility of
    dropout-free recipes is bit-identical. Gate: CONVNETS_TPU_HW_RNG=0.
    """
    bits = jax.random.bits(key, (4,), "uint32")
    return jax.random.wrap_key_data(bits, impl="unsafe_rbg")


def use_hw_dropout() -> bool:
    import os
    return os.environ.get("CONVNETS_TPU_HW_RNG", "1") != "0"


class RngStream:
    """A stateful convenience wrapper handing out fresh subkeys.

    Host-side only (never used inside jit): the per-step keys passed into the
    jitted train step are derived functionally via `key_for`/`fold_in`.
    """

    def __init__(self, seed: int, stream: str = "init"):
        self._key = key_for(seed, stream)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def set_reproducible_mode(seed: int, deterministic: bool = False) -> None:
    """Seed the host-side RNGs (numpy/python) used by data order and tuning.

    JAX device computation is deterministic given fixed keys, so unlike the
    reference there is no cudnn-determinism toggle to flip; `deterministic`
    is accepted for API parity (reference mngrutility.py:26).
    """
    del deterministic
    np.random.seed(seed)
    random.seed(seed)
