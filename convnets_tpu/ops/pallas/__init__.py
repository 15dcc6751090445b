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
from convnets_tpu.ops.pallas.conv import (
    block_diag_weight, conv2d_fused, conv2d_stats, conv2d_train,
    depthwise_conv2d, depthwise_train, grouped_conv2d_train,
)
from convnets_tpu.ops.pallas.fused import conv_bn_relu_train
from convnets_tpu.ops.pallas.pool import avg_pool2d, max_pool2d, pool2d_train

__all__ = [
    "block_diag_weight", "conv2d_fused", "conv2d_stats", "conv2d_train",
    "conv_bn_relu_train", "depthwise_conv2d", "depthwise_train",
    "grouped_conv2d_train", "max_pool2d", "avg_pool2d", "pool2d_train",
    "available",
    "enabled", "mode", "route_conv", "route_aux",
    "fits_conv", "fits_depthwise", "fits_grouped",
]


def available() -> bool:
    """True when running on a real TPU backend (Mosaic lowering)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mode() -> str:
    """CONVNETS_TPU_PALLAS: "0" (off, default), "1" (all fitting shapes),
    "auto" (only shapes the on-chip A/B adjudicated as Pallas wins —
    ops/pallas/routing.py)."""
    return os.environ.get("CONVNETS_TPU_PALLAS", "0")


def enabled() -> bool:
    """Opt-in AND single-device only: pallas_call has no GSPMD partitioning
    rule, so under a multi-chip sharded step it would force replication (or
    fail to partition). Multi-chip Pallas needs shard_map integration —
    future work; the lax path is used there."""
    return available() and jax.device_count() == 1 and mode() in ("1", "auto")


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
