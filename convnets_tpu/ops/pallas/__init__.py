"""Pallas TPU kernel library — the framework's native compute layer.

Occupies the architectural slot cuDNN holds for the reference
(SURVEY.md §2.2): fused conv(+BN)(+ReLU), depthwise conv, pooling. Each
kernel has an envelope (supported strides/groups/shapes); `available()`
and the envelope checks let callers fall back to the `lax`-backed ops
(`convnets_tpu.ops`) which serve as the correctness oracle in tests.

Enable on the hot path with Settings/env flag CONVNETS_TPU_PALLAS=1
(kernels are opt-in while XLA's fused convs remain the default — on TPU
XLA's own conv fusion is already near-optimal for the standard shapes,
so the Pallas path is measured per-shape before being preferred).
"""

from __future__ import annotations

import os

import jax

from convnets_tpu.core.shapes import to_pair
from convnets_tpu.ops.pallas import conv as _conv_mod
from convnets_tpu.ops.pallas import fused as _fused_mod
from convnets_tpu.ops.pallas import pool as _pool_mod
from convnets_tpu.ops.pallas.conv import block_diag_weight, depthwise_conv2d

__all__ = [
    "block_diag_weight", "conv2d_fused", "conv2d_stats", "conv2d_train",
    "conv_bn_relu_train", "depthwise_conv2d", "depthwise_train",
    "grouped_conv2d_train", "max_pool2d", "avg_pool2d", "pool2d_train",
    "available",
    "enabled", "mode", "route_conv", "route_aux",
    "fits_conv", "fits_depthwise", "fits_grouped",
]


def interpret_mode() -> bool:
    """CONVNETS_TPU_PALLAS_INTERPRET=1: run every kernel through the Pallas
    interpreter (pure-XLA emulation) — lets the kernel envelope, routing and
    SPMD wrapping be exercised on the CPU test mesh without Mosaic."""
    return os.environ.get("CONVNETS_TPU_PALLAS_INTERPRET", "0") == "1"


def available() -> bool:
    """True when running on a real TPU backend (Mosaic lowering), or when
    interpret mode emulates one."""
    try:
        return jax.devices()[0].platform == "tpu" or interpret_mode()
    except Exception:
        return False


def mode() -> str:
    """CONVNETS_TPU_PALLAS: "0" (off, default), "1" (all fitting shapes),
    "auto" (only shapes the on-chip A/B adjudicated as Pallas wins —
    ops/pallas/routing.py)."""
    return os.environ.get("CONVNETS_TPU_PALLAS", "0")


def enabled() -> bool:
    """Opt-in. Single-device kernels run as plain pallas_calls; under a
    multi-device mesh the batch-parallel kernels ride inside shard_map
    over the mesh's data axis (spmd_call below) — pallas_call itself has
    no GSPMD partitioning rule, so the r3 device_count()==1 gate is
    replaced by the shard_map envelope (r3 VERDICT #3). Multi-device use
    requires the Trainer's mesh to be registered (parallel.mesh
    set_active_mesh); without one the lax path serves."""
    if not (available() and mode() in ("1", "auto")):
        return False
    if jax.device_count() == 1:
        return True
    return _active_mesh() is not None


def _active_mesh():
    from convnets_tpu.parallel.mesh import active_mesh

    return active_mesh()


def spmd_active() -> bool:
    return jax.device_count() > 1 and _active_mesh() is not None


def spmd_call(fn, x, *consts, **kwargs):
    """Run a batch-parallel kernel under the active mesh.

    shard_map over the mesh's trailing (data) axis: `x` sharded on batch,
    `consts` (weights/scales) replicated, output sharded on batch. The
    kernel traces against the per-device batch slice, so its tile pickers
    and VMEM budgets size against local shapes. Identity wrapper on a
    single device.

    Differentiation: shard_map is transposable — a replicated operand's
    cotangent is psum'd over the mesh, so dw from the per-shard custom
    VJPs sums over shards exactly like the lax path's global conv
    backward. BN-stat-producing kernels (conv_bn_relu_train) are NOT
    routed here: their batch statistics are per-shard, which would break
    the sync-BN numerics the GSPMD lax path guarantees — ConvBNReLU falls
    back to the unfused path under SPMD (see nn/layers.py).
    """
    if not spmd_active():
        return fn(x, *consts, **kwargs)
    import functools

    from jax.sharding import PartitionSpec as P

    mesh = _active_mesh()
    ax = mesh.axis_names[-1]
    if x.shape[0] % mesh.shape[ax] != 0:
        # batch doesn't divide the mesh (e.g. direct kernel calls outside
        # the sharded step, or a registered mesh outliving its Trainer):
        # the envelope is an optimization, not a requirement — run plain
        return fn(x, *consts, **kwargs)
    f = functools.partial(fn, **kwargs)
    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax),) + tuple(P() for _ in consts),
        out_specs=P(ax),
        # pallas_call's out ShapeDtypeStructs carry no varying-mesh-axes
        # annotation; the batch-parallel contract (x sharded, consts
        # replicated, out sharded) is exactly what the specs above state
        check_vma=False,
    )(x, *consts)


# ----------------------------------------------------------------------
# Public kernel surface: each wrapper injects the interpret flag (CPU-mesh
# emulation) and rides spmd_call under an active multi-device mesh, so
# nn/layers.py routes through one spelling on one chip and on a mesh alike.


def _itp(interpret):
    return interpret_mode() if interpret is None else interpret


def conv2d_train(x, w, stride=1, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a, b: _conv_mod.conv2d_train(a, b, stride, padding, itp), x, w)


def depthwise_train(x, w, stride=1, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a, b: _conv_mod.depthwise_train(a, b, stride, padding, itp),
        x, w)


def grouped_conv2d_train(x, w, groups, stride=1, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a, b: _conv_mod.grouped_conv2d_train(
            a, b, groups, stride, padding, itp), x, w)


def conv2d_fused(x, w, scale=None, shift=None, *, stride=1, padding=0,
                 relu=False, interpret=None):
    itp = _itp(interpret)

    def k(a, b, *rest):
        s = rest[0] if scale is not None else None
        sh = rest[-1] if shift is not None else None
        return _conv_mod.conv2d_fused(a, b, s, sh, stride=stride,
                                      padding=padding, relu=relu,
                                      interpret=itp)

    consts = (w,) + tuple(t for t in (scale, shift) if t is not None)
    return spmd_call(k, x, *consts)


def conv2d_stats(x, w, *, stride=1, padding=0, interpret=None):
    """NOT spmd-wrapped: the returned per-batch sums are whole-batch
    quantities — under SPMD the caller (conv_bn_relu_train) is not routed
    at all (sync-BN numerics; see nn/layers.py ConvBNReLU)."""
    return _conv_mod.conv2d_stats(x, w, stride=stride, padding=padding,
                                  interpret=_itp(interpret))


def conv_bn_relu_train(x, w, scale, bias, stride=1, padding=0, groups=1,
                       eps=1e-5, relu=True, interpret=None):
    """Single-device only (per-shard batch stats would break sync-BN) —
    ConvBNReLU falls back to the unfused path when spmd_active()."""
    return _fused_mod.conv_bn_relu_train(x, w, scale, bias, stride, padding,
                                         groups, eps, relu, _itp(interpret))


def max_pool2d(x, kernel, stride=None, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a: _pool_mod.max_pool2d(a, kernel, stride, padding,
                                       interpret=itp), x)


def avg_pool2d(x, kernel, stride=None, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a: _pool_mod.avg_pool2d(a, kernel, stride, padding,
                                       interpret=itp), x)


def pool2d_train(x, pool_mode, kernel, stride=None, padding=0, interpret=None):
    itp = _itp(interpret)
    return spmd_call(
        lambda a: _pool_mod.pool2d_train(a, pool_mode, kernel, stride,
                                         padding, itp), x)


def route_conv(h: int, cin: int, cout: int, k: int, stride, train: bool) -> bool:
    """Shape-level adjudication for the dense conv(+BN) kernels: always
    True in mode "1"; in "auto", only the measured win shapes
    (routing.TRAIN_WINS / EVAL_WINS) leave XLA."""
    if mode() != "auto":
        return True
    from convnets_tpu.ops.pallas import routing

    sh, _ = to_pair(stride)
    return routing.prefer(h, cin, cout, k, sh, train)


def route_aux() -> bool:
    """Depthwise/grouped/pool kernels have no per-shape A/B table yet:
    they ride only in mode "1" (explicit opt-in), never in "auto"."""
    return mode() == "1"


def fits_conv(stride, dilation, groups: int) -> bool:
    """Envelope of conv2d_fused/conv2d_train: dense, undilated, stride
    (1,1) native or (2,2) via space-to-depth."""
    sh, sw = to_pair(stride)
    dh, dw = to_pair(dilation)
    return groups == 1 and (dh, dw) == (1, 1) and (sh, sw) in ((1, 1), (2, 2))


def fits_grouped(cin: int, cout: int, stride, dilation, groups: int) -> bool:
    """Envelope of grouped_conv2d_train's block-diagonal dense path: small
    per-group channel counts (ResNeXt/SENet/SKNet cardinality-32 blocks,
    reference resnext.py:93), where the grouped op is memory-bound and the
    G× structural-zero FLOPs ride otherwise-idle MXU lanes. Wide-group ops
    (ShuffleNet's Cin/G ≥ 64 1×1s) stay on XLA's native grouped conv —
    there the dense expansion would waste real compute."""
    sh, sw = to_pair(stride)
    dh, dw = to_pair(dilation)
    return (1 < groups <= 64 and cin % groups == 0 and cout % groups == 0
            and 2 <= cin // groups <= 32 and (dh, dw) == (1, 1)
            and (sh, sw) in ((1, 1), (2, 2)))


def fits_depthwise(cin: int, cout: int, dilation, groups: int) -> bool:
    """Envelope of depthwise_train: one filter per channel, multiplier 1
    (cout == cin); multiplier > 1 falls back to the lax path."""
    dh, dw = to_pair(dilation)
    return groups == cin and cout == cin and (dh, dw) == (1, 1)
