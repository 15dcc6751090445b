"""Parity tests for the whole-bottleneck-block megakernel
(ops/pallas/block.py, r3 VERDICT #2) against the lax oracle, via the
Pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnets_tpu.ops.pallas.block import (
    bottleneck_block, bottleneck_block_reference, fits_block,
)


def _make_inputs(key, n, h, w, cin, cmid, dtype):
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (n, h, w, cin), dtype)
    w1 = (jax.random.normal(ks[1], (cin, cmid), jnp.float32)
          / np.sqrt(cin)).astype(dtype)
    w2 = (jax.random.normal(ks[2], (3, 3, cmid, cmid), jnp.float32)
          / np.sqrt(9 * cmid)).astype(dtype)
    w3 = (jax.random.normal(ks[3], (cmid, cin), jnp.float32)
          / np.sqrt(cmid)).astype(dtype)
    s1 = jax.random.uniform(ks[4], (cmid,), jnp.float32, 0.5, 1.5)
    b1 = jax.random.normal(ks[5], (cmid,), jnp.float32) * 0.1
    s2 = jax.random.uniform(ks[6], (cmid,), jnp.float32, 0.5, 1.5)
    b2 = jax.random.normal(ks[7], (cmid,), jnp.float32) * 0.1
    s3 = jax.random.uniform(ks[8], (cin,), jnp.float32, 0.5, 1.5)
    b3 = jax.random.normal(ks[9], (cin,), jnp.float32) * 0.1
    return x, w1, s1, b1, w2, s2, b2, w3, s3, b3


@pytest.mark.parametrize("shape", [
    (2, 14, 14, 128, 32),   # stage-3 geometry, narrowed for CPU speed
    (2, 7, 7, 256, 64),     # stage-4 geometry
    (1, 8, 8, 64, 16),      # odd small shape
])
def test_block_matches_oracle_f32(shape):
    n, h, w, cin, cmid = shape
    args = _make_inputs(jax.random.key(0), n, h, w, cin, cmid, jnp.float32)
    got = bottleneck_block(*args, interpret=True)
    want = bottleneck_block_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_matches_oracle_bf16():
    args = _make_inputs(jax.random.key(1), 2, 14, 14, 128, 32, jnp.bfloat16)
    got = bottleneck_block(*args, interpret=True)
    want = bottleneck_block_reference(*args)
    # both paths accumulate fp32 and downcast per conv; interpreter conv
    # vs dot reduction order differs by a few bf16 ulps
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def test_block_no_final_relu():
    args = _make_inputs(jax.random.key(2), 1, 8, 8, 64, 16, jnp.float32)
    got = bottleneck_block(*args, relu_out=False, interpret=True)
    want = bottleneck_block_reference(*args, relu_out=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert float(np.asarray(got).min()) < 0.0  # relu really was skipped


def test_block_4d_weights_accepted():
    n, h, w, cin, cmid = 1, 8, 8, 64, 16
    args = list(_make_inputs(jax.random.key(3), n, h, w, cin, cmid,
                             jnp.float32))
    args[1] = args[1].reshape(1, 1, cin, cmid)
    args[7] = args[7].reshape(1, 1, cmid, cin)
    got = bottleneck_block(*args, interpret=True)
    want = bottleneck_block_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fits_block_envelope():
    # the two target RN50 shapes fit at bf16
    assert fits_block(14, 14, 1024, 256, 256)
    assert fits_block(28, 28, 512, 128, 256)
    # absurdly wide shape does not
    assert not fits_block(56, 56, 4096, 1024, 256)
