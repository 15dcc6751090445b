"""Pallas TPU conv kernels — the framework's cuDNN-analogue layer
(SURVEY.md §2.2: the reference delegates conv/BN/pool to cuDNN binaries;
here the same architectural slot is a from-scratch Mosaic kernel library).

Design (TPU-first, not a CUDA translation):

* Implicit-GEMM convolution: for every kernel tap (kh, kw) the input
  window is a (batch·OH·OW, Cin) matrix and the tap's weights are a
  (Cin, Cout) matrix — K·K matmuls accumulated in an fp32 VMEM scratch,
  all riding the 128×128 MXU. No im2col materialization in HBM.
* Grid over batch tiles; each program keeps its full (padded) input tile
  in VMEM — sized for the 32×32-class imagery this framework targets
  (CINIC-10/CIFAR), where a batch tile of 8 images at C≤512 is ≤4 MB.
* Optional fused epilogue: per-channel scale/shift (inference BatchNorm
  folded in) + ReLU — the conv2d_block fusion the reference gets from
  cuDNN+pointwise kernels (basemodel.py:999-1015).
* Backward runs through a custom_vjp whose cotangents are computed with
  XLA's transposed convolutions (already MXU-optimal); the Pallas win is
  the fused forward epilogue.

Constraints: stride (1,1) or (2,2), dilation 1, groups 1 (depthwise has
its own kernel), NHWC/HWIO. Callers gate on the envelope predicates
fits_conv / fits_depthwise (ops/pallas/__init__.py) and fall back to
ops.conv2d otherwise — see nn/layers.py Conv2d.apply for the dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnets_tpu.core.shapes import to_pair


def _pad_to_extent(x, ph, pw, need_h, need_w, value=0):
    """Symmetric-pad x (NHWC) by (ph, pw), extend to exactly
    (need_h, need_w) rows/cols (kernel-window read extent incl. any
    reshape slack), and clip any excess."""
    n, ih, iw, c = x.shape
    x = jnp.pad(x, ((0, 0), (ph, max(need_h - ih - ph, 0)),
                    (pw, max(need_w - iw - pw, 0)), (0, 0)),
                constant_values=value)
    return x[:, :need_h, :need_w, :]


def _strided_window(xv, i, j, oh, ow, sh, sw):
    """Tap (i, j)'s strided window of xv=(BT, IHp, IWp, C) → (BT, OH, OW, C).

    Mosaic rejects vector strided slices with stride > 1, so striding is
    expressed as split-reshape + unit-stride slice: rows i..i+OH·sh reshape
    to (OH, sh) and take phase 0 — only unit strides ever reach the lowering.
    (Used by the depthwise/pool kernels; the dense conv handles stride 2 by
    space-to-depth at the host level instead, see _space_to_depth.)
    """
    bt, _, _, c = xv.shape
    win = lax.slice(xv, (0, i, j, 0), (bt, i + oh * sh, j + ow * sw, c))
    if sh == 1 and sw == 1:
        return win
    win = win.reshape(bt, oh, sh, ow, sw, c)
    return lax.slice(
        win, (0, 0, 0, 0, 0, 0), (bt, oh, 1, ow, 1, c)
    ).reshape(bt, oh, ow, c)


def _space_to_depth_2x2(x):
    """(N, H, W, C) → (N, H/2, W/2, 4C), plane-major channel order
    ((p·2+q)·C + c for source offset (p, q))."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _decimate_1x1_stride2(x, ph, pw, oh, ow):
    """For a 1×1 stride-2 conv, the kernel reads input positions
    (2i−ph, 2j−pw) only — decimate at the XLA level (strided slices are
    free outside Mosaic) and run the 1×1 stride-1 kernel on the quarter-
    size input. Beats the generic space-to-depth rewrite, which widens the
    contraction to 4·Cin with ¾ structural zeros (4× weight VMEM + 4× MXU
    work) — at RN50's l4 shortcut (1024→2048) the s2d weight alone is
    16.8 MB and busts the 16 MB scoped-VMEM limit in-context."""
    n, ih, iw, cin = x.shape
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return x[:, : 2 * oh : 2, : 2 * ow : 2, :]


def _stride2_as_stride1(x, w, ph, pw, oh, ow):
    """Rewrite a (2, 2)-strided conv as a stride-1 conv over the 2×2
    space-to-depth transform — the TPU-native stride decomposition: every
    kernel window access becomes unit-stride, and the MXU contraction
    widens from Cin to 4·Cin.

    Returns (x_s2d, w_s2d) with w_s2d[a, b, (p·2+q)·C + c, o] =
    w[2a+p, 2b+q, c, o] (zero-padded where 2a+p/2b+q fall outside k).
    """
    n, ih, iw, cin = x.shape
    kh, kw, _, cout = w.shape
    kh2, kw2 = (kh + 1) // 2, (kw + 1) // 2

    # pad so every tap's s2d read is in bounds: rows 0..2·(oh+kh2-1)
    need_h, need_w = 2 * (oh + kh2 - 1), 2 * (ow + kw2 - 1)
    xs = _space_to_depth_2x2(_pad_to_extent(x, ph, pw, need_h, need_w))

    w2 = jnp.zeros((kh2, kw2, 4, cin, cout), w.dtype)
    for i in range(kh):
        for j in range(kw):
            w2 = w2.at[i // 2, j // 2, (i % 2) * 2 + (j % 2)].set(w[i, j])
    return xs, w2.reshape(kh2, kw2, 4 * cin, cout)


def _conv_kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, acc_ref,
                 *, kh, kw, sh, sw, oh, ow, relu, epilogue):
    """One batch-tile: accumulate K·K taps of implicit GEMM into fp32.

    x_ref:     (BT, IHp, IWp, Cin)  padded input tile in VMEM
    w_ref:     (kh·kw, Cin, Cout)   taps flattened on the leading axis
    scale_ref: (1, Cout) fp32       epilogue scale (BN folded) or ones
    shift_ref: (1, Cout) fp32       epilogue shift or zeros
    out_ref:   (BT, OH, OW, Cout)
    acc_ref:   (BT·OH·OW, Cout) fp32 scratch
    """
    bt = x_ref.shape[0]
    cin = x_ref.shape[3]
    cout = out_ref.shape[3]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    xv = x_ref[:]  # load once; taps below are register/VMEM slices
    for i in range(kh):
        for j in range(kw):
            win = _strided_window(xv, i, j, oh, ow, sh, sw)
            patches = win.reshape(bt * oh * ow, cin)
            acc_ref[:] += jnp.dot(
                patches, w_ref[i * kw + j],
                preferred_element_type=jnp.float32,
            )

    y = acc_ref[:]
    if epilogue:
        y = y * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bt, oh, ow, cout).astype(out_ref.dtype)


def _pick_batch_tile(n: int, ihp: int, iwp: int, cin: int, cout: int,
                     oh: int, ow: int, itemsize: int, fudge: float = 2.0,
                     kk: int = 1) -> int:
    """Largest divisor of n whose VMEM working set stays under budget.

    The base estimate is x tile + out + fp32 acc + the grid-resident
    weight (kk = kh·kw taps); Mosaic's stack also holds per-tap window
    temporaries (more of them for the reshape-based strided windowing),
    which `fudge` covers — factors measured against the 16 MB scoped-vmem
    limit per kernel: conv ≈2, depthwise ≈4, pool ≈9."""
    budget = 12 * 1024 * 1024
    wbytes = kk * cin * cout * itemsize
    for bt in range(min(n, 64), 0, -1):
        if n % bt:
            continue
        use = (bt * ihp * iwp * cin * itemsize          # x tile
               + bt * oh * ow * cout * (itemsize + 4))  # out + fp32 acc
        if use * fudge + wbytes <= budget:
            return bt
    return 1


def _whole_sample_ok(oh: int, ow: int, cin: int, bt: int,
                     per_sample: int, stack_bytes: int = 0) -> bool:
    """Keep the whole-sample (4D) kernel only inside its r2-proven regime:
    CINIC-class spatial (≤32×32) at moderate width. Outside it the Mosaic
    compile is empirically fragile (e.g. 56×56×64 bt=2 and the post-s2d
    14×14×1024 bt=8 both abort the compiler) — those route through the
    slab-tiled launch, whose picker budgets the per-tap windows in full.

    `stack_bytes` is the explicit windows-aware working-set estimate
    (x + out + acc + per-tap windows + weight) for the chosen bt; in-context
    compiles add an operand-relayout buffer on top of it (measured: the
    7×7×512 k3 shape estimates 13.3 MB standalone but allocates 16.21 MB
    when the input arrives with an untiled layout constraint), so anything
    estimating above 12 MB goes to the OH-slab kernel instead."""
    return (oh * ow <= 1024 and cin <= 512
            and stack_bytes <= 12 * 1024 * 1024
            and not (bt == 1 and per_sample * 2 > 12 * 1024 * 1024))


def _pick_slab_tiles(n: int, oh: int, ow: int, kh: int, iwp: int, cin: int,
                     cout: int, itemsize: int, fudge: float = 2.0,
                     sh: int = 1):
    """(bt, th) for the OH-slab-tiled kernel: batch tile × OH rows per
    program, full width and full Cout (weights + stats stay VMEM-resident
    across the whole grid). Maximizes the implicit-GEMM row count bt·th·OW
    under the VMEM budget; returns None when even (1, 1) does not fit."""
    # budget measured against Mosaic's 16 MB scoped VMEM: the per-tap
    # window temporaries all stay live (empirically — at 56×56×64 a
    # config with 6.5 MB of windows compiles and one with 13 MB aborts
    # the compiler), so they are counted in full
    del fudge
    budget = 8 * 1024 * 1024
    # the grid-resident weight is a separate VMEM allocation on top of the
    # per-program working set: charge it against the 16 MB scoped limit
    # (with headroom for Mosaic stack overhead + in-context relayout
    # buffers), not against the window budget — an 8.4 MB weight
    # (s2d l4.spatial/2) compiles fine, a 16.8 MB one cannot
    wbytes = kh * kh * cin * cout * itemsize
    total_cap = 14 * 1024 * 1024
    best = None
    for bt in [d for d in range(1, min(n, 64) + 1) if n % d == 0]:
        for th in [d for d in range(1, oh + 1) if oh % d == 0]:
            if bt * th * ow > 3136:
                # Mosaic empirically aborts above ~3136 GEMM rows per
                # program at these shapes (56·56 works, 112·56 aborts),
                # independent of the byte estimate — hard cap at the
                # largest validated row count
                continue
            slab = bt * (th * sh + kh - 1) * iwp * cin * itemsize
            out = bt * th * ow * cout * (itemsize + 4)
            windows = kh * kh * bt * th * ow * cin * itemsize
            if slab + out + windows > budget:
                continue
            if slab + out + windows + wbytes > total_cap:
                continue
            # effective MXU rows discounted by the slab-overlap re-read
            score = bt * th * th / (th * sh + kh - 1)
            key = (score, th)
            if best is None or key > best[0]:
                best = (key, (bt, th))
    return None if best is None else best[1]


def _make_slabs(x, th, kh, sh: int = 1):
    """(N, Hp, Wp, C) → (N, nt, th·sh+kh-1, Wp, C): overlapping OH slabs
    (output-row tiles of th, input extent per tile th·sh+kh-1),
    materialized once at the XLA level (overlap cost ≈(kh-sh)/th of one
    extra read of x — the price of expressing halos with disjoint Pallas
    blocks instead of manual DMA)."""
    n, hp, wp, c = x.shape
    # th·sh + kh - 1 rows per slab: (th-1)·sh + kh needed by the taps plus
    # sh-1 slack rows for the reshape-based strided windowing
    rows_per = th * sh + kh - 1
    nt = (hp - (kh - 1)) // (th * sh)
    idx = (jnp.arange(nt)[:, None] * (th * sh)
           + jnp.arange(rows_per)[None, :]).reshape(-1)
    xs = jnp.take(x, idx, axis=1)
    return xs.reshape(n, nt, rows_per, wp, c)


def _conv_tiled_kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, acc_ref,
                       *, kh, kw, th, ow, relu, epilogue):
    """One (batch, OH-slab) tile of the stride-1 implicit GEMM.

    x_ref:   (BT, 1, th+kh-1, IWp, Cin) input slab in VMEM
    w_ref:   (kh·kw, Cin, Cout) resident across the grid
    out_ref: (BT, th, OW, Cout)
    acc_ref: (BT·th·OW, Cout) fp32 scratch
    """
    bt = x_ref.shape[0]
    cin = x_ref.shape[4]
    cout = out_ref.shape[3]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    xv = x_ref[:, 0]
    for i in range(kh):
        for j in range(kw):
            win = lax.slice(xv, (0, i, j, 0), (bt, i + th, j + ow, cin))
            acc_ref[:] += jnp.dot(
                win.reshape(bt * th * ow, cin), w_ref[i * kw + j],
                preferred_element_type=jnp.float32,
            )

    y = acc_ref[:]
    if epilogue:
        y = y * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bt, th, ow, cout).astype(out_ref.dtype)


def _conv_tiled_stats_kernel(x_ref, w_ref, out_ref, stats_ref, acc_ref,
                             *, kh, kw, th, ow):
    """Tiled conv + per-channel Σy/Σy² accumulated across the whole grid
    (constant-index stats block: visited consecutively in every step, so
    it stays resident in VMEM — same pattern as _conv_stats_kernel)."""
    bt = x_ref.shape[0]
    cin = x_ref.shape[4]
    cout = out_ref.shape[3]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    xv = x_ref[:, 0]
    for i in range(kh):
        for j in range(kw):
            win = lax.slice(xv, (0, i, j, 0), (bt, i + th, j + ow, cin))
            acc_ref[:] += jnp.dot(
                win.reshape(bt * th * ow, cin), w_ref[i * kw + j],
                preferred_element_type=jnp.float32,
            )

    y = acc_ref[:]
    ys = y.astype(out_ref.dtype).astype(jnp.float32)
    stats_ref[0, :] += jnp.sum(ys, axis=0)
    stats_ref[1, :] += jnp.sum(ys * ys, axis=0)
    out_ref[:] = y.reshape(bt, th, ow, cout).astype(out_ref.dtype)


def _conv2d_tiled(x_padded, wt, ones, zeros, *, kh, kw, oh, ow, bt, th,
                  relu, epilogue, stats, interpret):
    """Launch the OH-slab-tiled kernel (stride 1; stride 2 arrives here
    post space-to-depth). x_padded: (N, need_h, need_w, Cin); wt:
    (kh·kw, Cin, Cout). Returns y or (y, sums, sumsq) when stats."""
    n, _, iwp, cin = x_padded.shape
    cout = wt.shape[2]
    xs = _make_slabs(x_padded, th, kh)
    nt = xs.shape[1]
    grid = (n // bt, nt)
    rows_per = th + kh - 1
    flops = 2 * n * oh * ow * cin * cout * kh * kw
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=xs.size * xs.dtype.itemsize
        + wt.size * wt.dtype.itemsize
        + n * oh * ow * cout * xs.dtype.itemsize,
        transcendentals=0,
    )
    x_spec = pl.BlockSpec((bt, 1, rows_per, iwp, cin),
                          lambda i, t: (i, t, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((kh * kw, cin, cout), lambda i, t: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, th, ow, cout), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bt * th * ow, cout), jnp.float32)]

    if stats:
        kernel = functools.partial(_conv_tiled_stats_kernel, kh=kh, kw=kw,
                                   th=th, ow=ow)
        y, st = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec, w_spec],
            out_specs=[
                out_spec,
                pl.BlockSpec((2, cout), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, oh, ow, cout), x_padded.dtype),
                jax.ShapeDtypeStruct((2, cout), jnp.float32),
            ],
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=interpret,
        )(xs, wt)
        return y, st[0], st[1]

    kernel = functools.partial(_conv_tiled_kernel, kh=kh, kw=kw, th=th,
                               ow=ow, relu=relu, epilogue=epilogue)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec, w_spec,
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), x_padded.dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
    )(xs, wt, ones, zeros)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "padding", "relu", "interpret"),
)
def conv2d_fused(
    x: jax.Array,
    w: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    relu: bool = False,
    interpret: bool = False,
):
    """Fused conv (+ scale/shift epilogue) (+ ReLU), forward-only building
    block. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout); scale/shift: (Cout,) fp32
    — pass the BN-folded multiplier/offset for a conv→BN(inference)→ReLU
    block, or None for a plain conv."""
    n, ih, iw, cin = x.shape
    kh, kw, wc, cout = w.shape
    assert wc == cin, f"grouped conv not supported here ({wc} != {cin})"
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)

    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    if (sh, sw) == (2, 2):
        if (kh, kw) == (1, 1):
            xd = _decimate_1x1_stride2(x, ph, pw, oh, ow)
            return conv2d_fused(xd, w, scale, shift, stride=1, padding=0,
                                relu=relu, interpret=interpret)
        # stride 2 → space-to-depth + stride-1 over 4·Cin (see
        # _stride2_as_stride1); recurse into the stride-1 path
        xs, ws = _stride2_as_stride1(x, w, ph, pw, oh, ow)
        return conv2d_fused(xs, ws, scale, shift, stride=1, padding=0,
                            relu=relu, interpret=interpret)

    # the extent the kernel windows read
    need_h = oh * sh + kh - 1
    need_w = ow * sw + kw - 1
    ihp, iwp = need_h, need_w

    epilogue = scale is not None or shift is not None
    ones = jnp.ones((1, cout), jnp.float32) if scale is None else scale.reshape(1, cout).astype(jnp.float32)
    zeros = jnp.zeros((1, cout), jnp.float32) if shift is None else shift.reshape(1, cout).astype(jnp.float32)

    bt = _pick_batch_tile(n, ihp, iwp, cin, cout, oh, ow, x.dtype.itemsize,
                          fudge=2.0, kk=kh * kw)
    per_sample = (ihp * iwp * cin * x.dtype.itemsize
                  + oh * ow * cout * (x.dtype.itemsize + 4))
    stack = (bt * per_sample  # x + out + fp32 acc
             + kh * kw * bt * oh * ow * cin * x.dtype.itemsize  # tap windows
             + kh * kw * cin * cout * x.dtype.itemsize)         # weight
    if not _whole_sample_ok(oh, ow, cin, bt, per_sample, stack):
        # outside the CINIC-proven whole-sample regime (r2): tile the OH
        # axis — grid (batch, OH-slab) with a windows-aware VMEM budget.
        # This is what lets the kernels run in-kernel at every RN50@224
        # shape (r2 fell back to XLA for ALL of these)
        tiles = _pick_slab_tiles(n, oh, ow, kh, need_w, cin, cout,
                                 x.dtype.itemsize)
        if tiles is not None:
            xp = _pad_to_extent(x, ph, pw, need_h, need_w)
            return _conv2d_tiled(
                xp, w.reshape(kh * kw, cin, cout).astype(x.dtype),
                ones, zeros, kh=kh, kw=kw, oh=oh, ow=ow, bt=tiles[0],
                th=tiles[1], relu=relu, epilogue=epilogue, stats=False,
                interpret=interpret)
        # nothing fits even one row at a time: XLA fallback — the
        # epilogue still fuses via XLA's pointwise fusion
        from convnets_tpu.ops.conv import conv2d as lax_conv2d

        y = lax_conv2d(x, w.astype(x.dtype), stride=(sh, sw), padding=(ph, pw))
        yf = y.astype(jnp.float32)
        if epilogue:
            yf = yf * ones[0] + zeros[0]
        if relu:
            yf = jnp.maximum(yf, 0.0)
        return yf.astype(x.dtype)

    x = _pad_to_extent(x, ph, pw, need_h, need_w)
    wt = w.reshape(kh * kw, cin, cout).astype(x.dtype)
    grid = (n // bt,)

    kernel = functools.partial(
        _conv_kernel, kh=kh, kw=kw, sh=sh, sw=sw, oh=oh, ow=ow,
        relu=relu, epilogue=epilogue,
    )
    flops = 2 * n * oh * ow * cin * cout * kh * kw
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, ihp, iwp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt * oh * ow, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + wt.size * wt.dtype.itemsize
            + n * oh * ow * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wt, ones, zeros)


def _conv_stats_kernel(x_ref, w_ref, out_ref, stats_ref, acc_ref,
                       *, kh, kw, sh, sw, oh, ow):
    """Conv batch-tile + per-channel batch-stat accumulation.

    Identical implicit GEMM to _conv_kernel, plus a (2, Cout) fp32 stats
    output accumulated ACROSS grid steps (constant index map → the block
    stays resident in VMEM): row 0 = Σy, row 1 = Σy² over (N·OH·OW).
    This is the train-mode BatchNorm statistics pass fused into the conv —
    the reference gets the same fusion from cuDNN inside conv2d_block
    (reference basemodel.py:999-1015); unfused, the stats cost a full
    HBM read of the conv output.
    """
    bt = x_ref.shape[0]
    cin = x_ref.shape[3]
    cout = out_ref.shape[3]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    xv = x_ref[:]
    for i in range(kh):
        for j in range(kw):
            win = _strided_window(xv, i, j, oh, ow, sh, sw)
            patches = win.reshape(bt * oh * ow, cin)
            acc_ref[:] += jnp.dot(
                patches, w_ref[i * kw + j],
                preferred_element_type=jnp.float32,
            )

    y = acc_ref[:]
    # stats of the stored (compute-dtype) values, not the fp32 accumulator:
    # keeps the fused path bit-consistent with unfused conv → BN over y
    ys = y.astype(out_ref.dtype).astype(jnp.float32)
    stats_ref[0, :] += jnp.sum(ys, axis=0)
    stats_ref[1, :] += jnp.sum(ys * ys, axis=0)
    out_ref[:] = y.reshape(bt, oh, ow, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "padding", "interpret"))
def conv2d_stats(x, w, *, stride=1, padding=0, interpret=False):
    """Conv forward that also returns per-channel (Σy, Σy²) over (N,OH,OW)
    — the fused statistics pass of train-mode conv+BN. Returns
    (y, sums, sumsq) with sums/sumsq fp32 (Cout,). Falls back to XLA conv +
    reduction outside the Pallas envelope (the reduction then costs one
    extra HBM pass, same as the unfused path)."""
    n, ih, iw, cin = x.shape
    kh, kw, wc, cout = w.shape
    assert wc == cin, f"grouped conv needs block-diag expansion ({wc} != {cin})"
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    if (sh, sw) == (2, 2):
        if (kh, kw) == (1, 1):
            xd = _decimate_1x1_stride2(x, ph, pw, oh, ow)
            return conv2d_stats(xd, w, stride=1, padding=0,
                                interpret=interpret)
        xs, ws = _stride2_as_stride1(x, w, ph, pw, oh, ow)
        return conv2d_stats(xs, ws, stride=1, padding=0, interpret=interpret)

    need_h = oh * sh + kh - 1
    need_w = ow * sw + kw - 1
    ihp, iwp = need_h, need_w

    bt = _pick_batch_tile(n, ihp, iwp, cin, cout, oh, ow, x.dtype.itemsize,
                          fudge=2.0, kk=kh * kw)
    per_sample = (ihp * iwp * cin * x.dtype.itemsize
                  + oh * ow * cout * (x.dtype.itemsize + 4))
    stack = (bt * per_sample
             + kh * kw * bt * oh * ow * cin * x.dtype.itemsize
             + kh * kw * cin * cout * x.dtype.itemsize)
    if not _whole_sample_ok(oh, ow, cin, bt, per_sample, stack):
        tiles = _pick_slab_tiles(n, oh, ow, kh, need_w, cin, cout,
                                 x.dtype.itemsize)
        if tiles is not None:
            xp = _pad_to_extent(x, ph, pw, need_h, need_w)
            return _conv2d_tiled(
                xp, w.reshape(kh * kw, cin, cout).astype(x.dtype),
                None, None, kh=kh, kw=kw, oh=oh, ow=ow, bt=tiles[0],
                th=tiles[1], relu=False, epilogue=False, stats=True,
                interpret=interpret)
        from convnets_tpu.ops.conv import conv2d as lax_conv2d

        y = lax_conv2d(x, w.astype(x.dtype), stride=(sh, sw), padding=(ph, pw))
        yf = y.astype(jnp.float32)
        return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))

    x = _pad_to_extent(x, ph, pw, need_h, need_w)
    wt = w.reshape(kh * kw, cin, cout).astype(x.dtype)
    kernel = functools.partial(_conv_stats_kernel, kh=kh, kw=kw, sh=sh, sw=sw,
                               oh=oh, ow=ow)
    flops = 2 * n * oh * ow * cin * cout * kh * kw
    y, stats = pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, ihp, iwp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, oh, ow, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, oh, ow, cout), x.dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt * oh * ow, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + wt.size * wt.dtype.itemsize
            + n * oh * ow * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wt)
    return y, stats[0], stats[1]


def block_diag_weight(w, groups: int):
    """Expand a grouped HWIO weight (kh, kw, Cin/G, Cout) into the dense
    block-diagonal equivalent (kh, kw, Cin, Cout): group g's filters see
    only input channels [g·cg, (g+1)·cg). Lets the grouped convs of
    ResNeXt (cardinality 32, reference resnext.py:93) and ShuffleNet
    (g 1–8, reference shufflenet_v1.py:119-141) ride the same dense
    implicit-GEMM MXU kernel — trading G× redundant FLOPs (multiplies by
    structural zeros) for full 128-lane contraction, a win whenever the
    grouped op is memory-bound (small per-group channel counts)."""
    kh, kw, cg, cout = w.shape
    og = cout // groups
    dense = jnp.zeros((kh, kw, cg * groups, cout), w.dtype)
    for g in range(groups):
        dense = dense.at[:, :, g * cg:(g + 1) * cg, g * og:(g + 1) * og].set(
            w[:, :, :, g * og:(g + 1) * og])
    return dense


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv2d_train(x, w, groups, stride=1, padding=0, interpret=False):
    """Trainable grouped conv: forward through the dense Pallas kernel on a
    block-diagonal weight, cotangents through XLA's grouped conv transpose
    (which never materializes the dense blocks — dw comes back exactly
    (kh, kw, Cin/G, Cout))."""
    return conv2d_fused(x, block_diag_weight(w, groups).astype(x.dtype),
                        stride=stride, padding=padding, interpret=interpret)


def _grouped_train_fwd(x, w, groups, stride, padding, interpret):
    return grouped_conv2d_train(x, w, groups, stride, padding, interpret), (x, w)


def _grouped_train_bwd(groups, stride, padding, interpret, res, g):
    from convnets_tpu.ops.conv import conv2d as lax_conv2d

    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: lax_conv2d(x_, w_, stride=stride, padding=padding,
                                  groups=groups), x, w
    )
    return vjp(g.astype(x.dtype))


grouped_conv2d_train.defvjp(_grouped_train_fwd, _grouped_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_train(x, w, stride=1, padding=0, interpret=False):
    """Trainable Pallas conv: forward through the implicit-GEMM kernel,
    cotangents through XLA's transposed convolutions (dx: input-dilated
    conv with flipped kernel; dw: x ⊛ g patch correlation — both already
    MXU-optimal in XLA, so only the forward needs a hand-written kernel)."""
    return conv2d_fused(x, w, stride=stride, padding=padding,
                        interpret=interpret)


def _conv2d_train_fwd(x, w, stride, padding, interpret):
    return conv2d_train(x, w, stride, padding, interpret), (x, w)


def _conv2d_train_bwd(stride, padding, interpret, res, g):
    from convnets_tpu.ops.conv import conv2d as lax_conv2d

    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: lax_conv2d(x_, w_, stride=stride, padding=padding), x, w
    )
    return vjp(g.astype(x.dtype))


conv2d_train.defvjp(_conv2d_train_fwd, _conv2d_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise_train(x, w, stride=1, padding=0, interpret=False):
    """Trainable Pallas depthwise conv (cotangents via XLA, as conv2d_train)."""
    return depthwise_conv2d(x, w, stride=stride, padding=padding,
                            interpret=interpret)


def _depthwise_train_fwd(x, w, stride, padding, interpret):
    return depthwise_train(x, w, stride, padding, interpret), (x, w)


def _depthwise_train_bwd(stride, padding, interpret, res, g):
    from convnets_tpu.ops.conv import conv2d_depthwise as lax_dw

    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: lax_dw(x_, w_, stride=stride, padding=padding), x, w
    )
    return vjp(g.astype(x.dtype))


depthwise_train.defvjp(_depthwise_train_fwd, _depthwise_train_bwd)


def _dw_tiled_kernel(x_ref, w_ref, out_ref, *, kh, kw, sh, sw, th, ow):
    """Depthwise conv over one (batch, OH-slab) tile — the VPU analogue of
    _conv_tiled_kernel for 224-class depthwise stacks (MobileNet stress
    config, BASELINE #4) whose whole-sample tiles overflow VMEM."""
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    xv = x_ref[:, 0]
    for i in range(kh):
        for j in range(kw):
            win = _strided_window(xv, i, j, th, ow, sh, sw)
            acc = acc + win.astype(jnp.float32) * w_ref[i * kw + j, 0].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _dw_kernel(x_ref, w_ref, out_ref, *, kh, kw, sh, sw, oh, ow):
    """Depthwise conv batch-tile: pure VPU multiply-accumulate.

    x_ref: (BT, IHp, IWp, C); w_ref: (kh·kw, 1, C); out_ref: (BT, OH, OW, C).
    """
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    xv = x_ref[:]
    for i in range(kh):
        for j in range(kw):
            win = _strided_window(xv, i, j, oh, ow, sh, sw)
            acc = acc + win.astype(jnp.float32) * w_ref[i * kw + j, 0].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("stride", "padding", "interpret")
)
def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride=1,
    padding=0,
    interpret: bool = False,
):
    """Depthwise conv: one filter per channel, multiplier 1
    (reference conv2d_depthwise, basemodel.py:981-997). Memory-bound, so
    it runs entirely on the VPU — no MXU underutilization from C 1-wide
    matmuls. x: (N,H,W,C), w: (kh,kw,1,C)."""
    n, ih, iw, c = x.shape
    kh, kw, one, wc = w.shape
    assert one == 1 and wc == c, f"depthwise expects (kh,kw,1,C), got {w.shape}"
    sh, sw = to_pair(stride)
    ph, pw = to_pair(padding)
    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1

    need_h = oh * sh + kh - 1
    need_w = ow * sw + kw - 1
    x = _pad_to_extent(x, ph, pw, need_h, need_w)

    wt = w.reshape(kh * kw, 1, c).astype(x.dtype)
    bt = _pick_batch_tile(n, need_h, need_w, c, c, oh, ow, x.dtype.itemsize, fudge=4.0)
    per_sample = (need_h * need_w * c * x.dtype.itemsize
                  + oh * ow * c * (x.dtype.itemsize + 4))
    if bt == 1 and per_sample * 4 > 12 * 1024 * 1024:
        # whole sample overflows VMEM (224-class depthwise stacks): tile OH
        tiles = _pick_slab_tiles(n, oh, ow, kh, need_w, c, c,
                                 x.dtype.itemsize, fudge=4.0, sh=sh)
        if tiles is None:
            from convnets_tpu.ops.conv import conv2d_depthwise as lax_dw

            return lax_dw(x[:, : (oh - 1) * sh + kh, : (ow - 1) * sw + kw],
                          w.astype(x.dtype), stride=(sh, sw), padding=0)
        btt, th = tiles
        xs = _make_slabs(x, th, kh, sh=sh)
        nt = xs.shape[1]
        rows_per = th * sh + kh - 1
        kernel = functools.partial(_dw_tiled_kernel, kh=kh, kw=kw, sh=sh,
                                   sw=sw, th=th, ow=ow)
        return pl.pallas_call(
            kernel,
            grid=(n // btt, nt),
            in_specs=[
                pl.BlockSpec((btt, 1, rows_per, need_w, c),
                             lambda i, t: (i, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kh * kw, 1, c), lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((btt, th, ow, c),
                                   lambda i, t: (i, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
            interpret=interpret,
        )(xs, wt)

    kernel = functools.partial(_dw_kernel, kh=kh, kw=kw, sh=sh, sw=sw,
                               oh=oh, ow=ow)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, need_h, need_w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=interpret,
    )(x, wt)
