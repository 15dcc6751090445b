"""The roofline per-conv timer must actually re-execute the conv each scan
iteration. An earlier version chained iterations through `lhs * (1 + s*0.0)`;
XLA folds s*0.0 to 0, hoists the then-loop-invariant conv out of the while
loop, and the 'measurement' was loop overhead (the top RN50 class implied
780 TFLOP/s — 4x the v5e peak). This pins the fixed chain: the compiled HLO
must keep the convolution INSIDE the while body.
"""

import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_roofline():
    spec = importlib.util.spec_from_file_location(
        "roofline_rn50", os.path.join(REPO, "scripts", "roofline_rn50.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SMALL_CLASS = {
    "lhs": [[4, 8, 8, 16], "float32"],
    "rhs": [[3, 3, 16, 16], "float32"],
    "window_strides": [1, 1],
    "padding": [[1, 1], [1, 1]],
    "lhs_dilation": [1, 1],
    "rhs_dilation": [1, 1],
    "dn": ((0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2)),
    "groups": 1,
    "batch_groups": 1,
    "t_bound_ms": 0.05,
}


def test_measure_class_runs_and_returns_positive():
    rl = _load_roofline()
    ms, iters = rl.measure_class(dict(SMALL_CLASS), iters=8)
    assert iters == 8
    assert ms > 0


def test_conv_stays_inside_the_while_body():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cls = SMALL_CLASS
    lhs = jnp.zeros(cls["lhs"][0], jnp.float32)
    rhs = jnp.zeros(cls["rhs"][0], jnp.float32)
    dn = lax.ConvDimensionNumbers(*(tuple(d) for d in cls["dn"]))

    # Same chaining construction as measure_class (small operand scaled by
    # 1 + s*1e-30, s carried from the previous iteration's output).
    def body(s, _):
        y = lax.conv_general_dilated(
            lhs, rhs * (1.0 + s * 1e-30).astype(rhs.dtype),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=dn)
        return y.reshape(-1)[0].astype(jnp.float32), None

    fn = jax.jit(lambda s: lax.scan(body, s, None, length=16)[0])
    hlo = fn.lower(jnp.float32(0.0)).compile().as_text()

    # One while loop, and the convolution is defined inside a (fused)
    # computation that the while body calls — i.e. it was NOT hoisted to
    # the entry computation ahead of the loop.
    assert hlo.count("while(") == 1
    entry = hlo.split("ENTRY")[-1]
    assert not re.search(r"convolution", entry), (
        "conv was hoisted out of the loop into the entry computation")
    assert re.search(r"convolution", hlo), "conv disappeared entirely"


# NOTE: the broken s*0.0 form is NOT reproducible on CPU XLA (its
# simplifier keeps the mul); the fold-and-hoist was observed on the TPU
# pipeline, where class timings implied >peak throughput. The 1e-30 form
# is safe on every backend because the scale is a genuine runtime value.
