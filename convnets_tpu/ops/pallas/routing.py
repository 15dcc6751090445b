"""Per-shape Pallas-vs-XLA routing table (CONVNETS_TPU_PALLAS=auto).

The entries are MEASURED on-chip (scripts/ab_conv224.py → PALLAS_AB.md /
data/output/ab_conv224.json, v5e-1, batch 256, bf16): a shape routes to
the Mosaic kernels only where the A/B showed the Pallas implicit-GEMM
conv(+stats) beating XLA's conv fusion. Everything else — including any
shape never measured — stays on XLA, which is the safe default (the
reference gets this adjudication for free from cuDNN's heuristics
engine, reference basemodel.py:999-1015; here it is an explicit table).

Key: (H, Cin, Cout, k, stride) of the conv call (square inputs; the
224-class zoo only ever uses square shapes). Regenerate with
scripts/gen_routing.py after re-running the A/B.
"""

from __future__ import annotations

# shapes where the fused conv+batch-stats Pallas kernel beat XLA's
# conv + fp32 reduction in the train A/B (PALLAS_AB.md "train winner")
TRAIN_WINS = {
    (56, 64, 64, 1, 1),      # l1.compress
    (56, 64, 256, 1, 1),     # l1.expand
    (56, 256, 64, 1, 1),     # l1.compress2
    (28, 128, 512, 1, 1),    # l2.expand
    (28, 512, 128, 1, 1),    # l2.compress2
    (28, 128, 128, 3, 1),    # l2.spatial
    (28, 512, 1024, 1, 2),   # l3.shortcut/2 (decimated-1x1 lowering)
    (14, 1024, 256, 1, 1),   # l3.compress2
    (14, 1024, 512, 1, 1),   # l4.compress
    (14, 512, 512, 3, 2),    # l4.spatial/2
    (7, 512, 2048, 1, 1),    # l4.expand
}

# shapes where eval-mode conv2d_fused beat the plain XLA conv
EVAL_WINS = {
    (56, 64, 256, 1, 1),     # l1.expand / l1.shortcut
    (56, 256, 64, 1, 1),     # l1.compress2
    (56, 256, 128, 1, 1),    # l2.compress
    (28, 128, 512, 1, 1),    # l2.expand
    (14, 1024, 256, 1, 1),   # l3.compress2
    (14, 256, 256, 3, 1),    # l3.spatial
    (14, 1024, 512, 1, 1),   # l4.compress
    (14, 512, 512, 3, 2),    # l4.spatial/2
    (7, 512, 2048, 1, 1),    # l4.expand
}


def prefer(h: int, cin: int, cout: int, k: int, stride: int,
           train: bool) -> bool:
    """True iff the measured A/B says the Pallas kernel wins this conv
    shape. Unmeasured shapes return False — XLA is the adjudicated
    default, never the experiment."""
    key = (h, cin, cout, k, stride)
    return key in (TRAIN_WINS if train else EVAL_WINS)
