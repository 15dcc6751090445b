"""The roofline per-conv timer must actually re-execute the conv each scan
iteration. Two broken generations of the dependency chain motivated these
tests (history in scripts/roofline_rn50.py:_chained_scan_fn):

  gen 1: `lhs * (1 + s*0.0)` — s*0.0 folded to 0, conv hoisted; the top
         RN50 class implied 780 TFLOP/s, 4x the v5e peak.
  gen 2: `rhs * (1 + s*1e-30)` — a genuine runtime scale, but conv is
         BILINEAR: the TPU pipeline factors conv(l, r*eps) into
         conv(l, r)*eps and hoists the conv anyway (950+ TFLOP/s implied).

gen 3 chains through an in-place dynamic_update_slice on a loop-carried
operand buffer, which is not factorable. These tests pin (a) the compiled
HLO keeps the convolution inside the while body, (b) the chain is the DUS
form (the only one with no known algebraic escape), and (c) the
physical-impossibility guard that converts any future silent escape into
a loud failure.
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
    # flops for the guard: 2 * |out| * kh*kw*Cin = 2*4*8*8*16*3*3*16
    "flops": 2.0 * 4 * 8 * 8 * 16 * 3 * 3 * 16,
}


def test_measure_class_runs_and_returns_positive():
    rl = _load_roofline()
    ms, iters = rl.measure_class(dict(SMALL_CLASS), iters=8)
    assert iters == 8
    assert ms > 0


def _lowered_hlo(iters=16):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rl = _load_roofline()
    cls = SMALL_CLASS
    lhs = jnp.zeros(cls["lhs"][0], jnp.float32)
    rhs = jnp.zeros(cls["rhs"][0], jnp.float32)
    dn = lax.ConvDimensionNumbers(*(tuple(d) for d in cls["dn"]))

    def one_lr(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=dn)

    fn = rl._chained_scan_fn(cls, lhs, rhs, one_lr, iters)
    hlo = fn.lower(jnp.float32(0.0), lhs, rhs).compile().as_text()
    # Operands must be runtime parameters, not embedded constants (the
    # relay caps the compile-request body; closure-captured arrays
    # produced HTTP 413 on the big weight-grad classes).
    entry = hlo.split("ENTRY")[-1]
    assert entry.count("parameter(") >= 3
    return hlo


def test_conv_stays_inside_the_while_body():
    hlo = _lowered_hlo()
    # One while loop, and the convolution is defined inside a (fused)
    # computation that the while body calls — i.e. it was NOT hoisted to
    # the entry computation ahead of the loop.
    assert hlo.count("while(") == 1
    entry = hlo.split("ENTRY")[-1]
    assert not re.search(r"convolution", entry), (
        "conv was hoisted out of the loop into the entry computation")
    assert re.search(r"convolution", hlo), "conv disappeared entirely"


def test_chain_is_the_dus_form():
    # The update must survive compilation as a dynamic-update-slice (the
    # non-factorable chain); a scalar-multiply chain compiles to pure
    # multiplies and would fail this.
    hlo = _lowered_hlo()
    assert "dynamic-update-slice" in hlo, (
        "the loop-carried DUS chain was compiled away — the timer is "
        "vulnerable to the bilinearity factoring that broke gen 2")


def test_impossible_timing_is_flagged():
    rl = _load_roofline()
    cls = dict(SMALL_CLASS)
    # 1.18 MFLOP in 1 ns -> ~1180 TFLOP/s, way over any chip peak.
    assert rl.implied_tflops(cls, 1e-6) > 1.15 * rl.PEAK_FLOPS / 1e12
    # A sane timing stays under the guard: the bound itself implies
    # at most the peak by construction.
    sane_ms = cls["flops"] / rl.PEAK_FLOPS * 1e3
    assert rl.implied_tflops(cls, sane_ms) <= 1.15 * rl.PEAK_FLOPS / 1e12
