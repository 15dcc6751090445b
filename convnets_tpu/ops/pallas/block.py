"""Whole-bottleneck-block Pallas megakernel — the r3 VERDICT #2 experiment.

PERF.md §5's per-conv A/B showed every `tpu_custom_call` acts as a
fusion/latency-hiding barrier: per-call wins did not survive in the full
step. The untested corollary was that FEWER, BIGGER kernels might win —
one kernel per residual block instead of one per conv, so the
intermediate activations (h1, h2) never travel to HBM at all. This module
is that experiment: the full RN50 bottleneck block

    out = ReLU( s3·(conv1x1(ReLU(s2·conv3x3(ReLU(s1·conv1x1(x)+b1))+b2))
                )+b3 + x )

as ONE pallas_call (inference form: BN folded into per-channel
scale/shift — the cuDNN fused-block slot, reference basemodel.py:999-1015).
Stride-1 identity-shortcut blocks only (13 of RN50's 16 blocks); the
3 downsample blocks keep the XLA path.

Dataflow per (batch-tile) program, everything VMEM-resident:
    x (BT,H,W,Cin) ── GEMM W1 ──> h1 in a ZERO-BORDERED scratch
    (BT,H+2,W+2,Cmid) ── 9-tap implicit GEMM W2 ──> h2 (BT·H·W,Cmid)
    ── GEMM W3 + residual(x) ──> out (BT,H,W,Cin)
h1/h2 exist only in VMEM: vs the XLA path the block saves 4 HBM round
trips of the mid tensor and 2 of the wide tensor per block.

Measured verdict (scripts/tpu_block_ab.py, data/output/block_ab.json):
see PERF.md §5 addendum — this closes the bigger-kernels hypothesis with
data at the two most common RN50 shapes (14²×1024/256 ×6 blocks,
28²×512/128 ×4 blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, w1_ref, w2_ref, w3_ref, sb_ref, out_ref,
                  h1_ref, acc_ref, *, h, w, cmid, relu_out):
    """One batch tile of the fused bottleneck block.

    x_ref:  (BT, H, W, Cin)           input tile (also the residual)
    w1_ref: (Cin, Cmid)               1×1 reduce
    w2_ref: (9, Cmid, Cmid)           3×3 taps flattened
    w3_ref: (Cmid, Cin)               1×1 expand
    sb_ref: (6, Cwide) fp32           rows: s1,b1,s2,b2,s3,b3 (mid rows
                                      zero-padded to Cwide on the right)
    out_ref: (BT, H, W, Cin)
    h1_ref: (BT, H+2, W+2, Cmid)      zero-bordered mid scratch (bf16/x dtype)
    acc_ref: (BT·H·W, Cwide) fp32     GEMM accumulator (wide enough for
                                      both the mid and the expand GEMMs)
    """
    bt = x_ref.shape[0]
    cin = x_ref.shape[3]
    rows = bt * h * w

    xv = x_ref[:]
    xm = xv.reshape(rows, cin)

    # ---- conv1 (1×1) + bn1 + relu → h1 (zero-bordered) ------------------
    a1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    a1 = a1 * sb_ref[0, :cmid] + sb_ref[1, :cmid]
    a1 = jnp.maximum(a1, 0.0)
    h1_ref[:] = jnp.zeros_like(h1_ref)
    h1_ref[:, 1:h + 1, 1:w + 1, :] = (
        a1.reshape(bt, h, w, cmid).astype(h1_ref.dtype))

    # ---- conv2 (3×3, pad 1) + bn2 + relu --------------------------------
    acc_ref[:, :cmid] = jnp.zeros((rows, cmid), jnp.float32)
    h1v = h1_ref[:]
    for i in range(3):
        for j in range(3):
            win = lax.slice(h1v, (0, i, j, 0), (bt, i + h, j + w, cmid))
            acc_ref[:, :cmid] += jnp.dot(
                win.reshape(rows, cmid), w2_ref[i * 3 + j],
                preferred_element_type=jnp.float32)
    h2 = acc_ref[:, :cmid] * sb_ref[2, :cmid] + sb_ref[3, :cmid]
    h2 = jnp.maximum(h2, 0.0).astype(x_ref.dtype)

    # ---- conv3 (1×1) + bn3 + residual + relu ----------------------------
    a3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    y = a3 * sb_ref[4] + sb_ref[5] + xm.astype(jnp.float32)
    if relu_out:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bt, h, w, cin).astype(out_ref.dtype)


def _pick_bt(n, h, w, cin, cmid, itemsize):
    """Largest divisor of n under the measured VMEM budget: x + out +
    padded-h1 scratch + wide fp32 acc + the 9 live conv2 window
    temporaries (r3 lesson: Mosaic keeps every tap's window on the
    stack), weights charged separately against the 16 MB scope."""
    budget = 10 * 1024 * 1024
    wbytes = (cin * cmid + 9 * cmid * cmid + cmid * cin) * itemsize
    for bt in range(min(n, 32), 0, -1):
        if n % bt:
            continue
        rows = bt * h * w
        use = (2 * bt * h * w * cin * itemsize        # x + out
               + bt * (h + 2) * (w + 2) * cmid * itemsize
               + rows * cin * 4                        # wide fp32 acc
               + 9 * rows * cmid * itemsize)           # live conv2 windows
        if use + wbytes <= budget:
            return bt
    return None


def fits_block(h: int, w: int, cin: int, cmid: int, n: int,
               itemsize: int = 2) -> bool:
    """Envelope: stride-1 identity bottleneck whose working set fits at
    some batch tile (RN50 14²×1024/256 and 28²×512/128 qualify; 56²×256
    does not at bf16 without OH-slab tiling — measured negative anyway,
    see PERF.md §5 addendum)."""
    return _pick_bt(n, h, w, cin, cmid, itemsize) is not None


@functools.partial(jax.jit, static_argnames=("relu_out", "interpret"))
def bottleneck_block(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, *,
                     relu_out=True, interpret=False):
    """Fused inference bottleneck block (see module docstring).

    x: (N,H,W,Cin); w1: (1,1,Cin,Cmid) or (Cin,Cmid); w2: (3,3,Cmid,Cmid);
    w3: (1,1,Cmid,Cin) or (Cmid,Cin); s*/b*: per-channel fp32 folded BN
    scale/shift. Returns (N,H,W,Cin) in x.dtype.
    """
    n, h, w, cin = x.shape
    if w1.ndim == 4:
        w1 = w1.reshape(w1.shape[2], w1.shape[3])
    if w3.ndim == 4:
        w3 = w3.reshape(w3.shape[2], w3.shape[3])
    cmid = w1.shape[1]
    w2t = w2.reshape(9, cmid, cmid) if w2.ndim == 4 else w2

    bt = _pick_bt(n, h, w, cin, cmid, x.dtype.itemsize)
    if bt is None:
        raise ValueError(f"bottleneck_block: no batch tile fits "
                         f"{(n, h, w, cin, cmid)}")

    # fold the six per-channel vectors into one (6, Cin) fp32 operand
    # (mid-width rows zero-padded — one resident block instead of six)
    sb = jnp.zeros((6, cin), jnp.float32)
    for r, v in enumerate((s1, b1, s2, b2, s3, b3)):
        sb = sb.at[r, :v.shape[0]].set(v.astype(jnp.float32))

    rows = bt * h * w
    flops = 2 * n * h * w * (cin * cmid + 9 * cmid * cmid + cmid * cin)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * x.size * x.dtype.itemsize
        + (w1.size + w2t.size + w3.size) * w1.dtype.itemsize,
        transcendentals=0,
    )
    kernel = functools.partial(_block_kernel, h=h, w=w, cmid=cmid,
                               relu_out=relu_out)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cmid, cmid), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cin), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, w + 2, cmid), x.dtype),
            pltpu.VMEM((rows, cin), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(x, w1, w2t, w3, sb)


def bottleneck_block_reference(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, *,
                               relu_out=True):
    """lax oracle with identical numerics contract (fp32 accumulation,
    per-conv downcast to x.dtype) for parity tests and the XLA arm of the
    A/B."""
    def conv(v, wk, pad):
        return lax.conv_general_dilated(
            v, wk, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    if w1.ndim == 2:
        w1 = w1.reshape(1, 1, *w1.shape)
    if w3.ndim == 2:
        w3 = w3.reshape(1, 1, *w3.shape)
    h1 = jnp.maximum(conv(x, w1, 0) * s1 + b1, 0.0).astype(x.dtype)
    h2 = jnp.maximum(conv(h1, w2, 1) * s2 + b2, 0.0).astype(x.dtype)
    y = conv(h2, w3, 0) * s3 + b3 + x.astype(jnp.float32)
    if relu_out:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
