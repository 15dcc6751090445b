"""ops — the cuDNN-replacement layer.

lax-backed reference implementations (the correctness oracle) plus Pallas
TPU kernels for the hot paths under ops/pallas/. Every Pallas kernel is
validated against the lax oracle in tests.
"""

from convnets_tpu.ops.conv import conv2d, conv2d_depthwise, linear  # noqa: F401
from convnets_tpu.ops.pool import (  # noqa: F401
    max_pool2d,
    avg_pool2d,
    global_avg_pool2d,
    adaptive_avg_pool2d,
)
from convnets_tpu.ops.norm import (  # noqa: F401
    batch_norm_train, batch_norm_inference, batch_stats, bn_apply_stats,
)
from convnets_tpu.ops.activations import (  # noqa: F401
    relu,
    sigmoid,
    softmax,
    flatten,
    channel_shuffle,
    dropout,
)
from convnets_tpu.ops.losses import cross_entropy_sum, correct_count  # noqa: F401
from convnets_tpu.ops import initializers  # noqa: F401
