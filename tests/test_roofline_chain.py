"""The roofline per-conv timer must actually re-execute the conv each scan
iteration. Two broken generations of the dependency chain motivated these
tests (history in scripts/roofline_rn50.py:_chained_scan_fn):

  gen 1: `lhs * (1 + s*0.0)` — s*0.0 folded to 0, conv hoisted; the top
         RN50 class implied 780 TFLOP/s, 4x the v5e peak.
  gen 2: `rhs * (1 + s*1e-30)` — a genuine runtime scale, but conv is
         BILINEAR: the TPU pipeline factors conv(l, r*eps) into
         conv(l, r)*eps and hoists the conv anyway (950+ TFLOP/s implied).

  gen 3: DUS chain on the carried operand, but consuming only
         `y.reshape(-1)[0]` — with one output element live the TPU
         pipeline narrows the conv to that element's window dot
         (on-chip: 0.064 ms, 930 implied TFLOP/s, caught by the guard).

gen 4 keeps the in-place dynamic_update_slice on a loop-carried operand
buffer (input side: not factorable) and chains through `sum(y*y)` over
the whole output (output side: every element live, and sum-of-squares is
non-linear so no bilinearity identity collapses it). These tests pin
(a) the compiled HLO keeps the convolution inside the while body, (b) the
chain is the DUS form, (c) the carry consumes the full output via the
non-linear reduction, and (d) the physical-impossibility guard that
converts any future silent escape into a loud failure.
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


def test_chain_consumes_full_output_nonlinearly():
    # Semantics pin: the carry after k iterations must equal the
    # hand-rolled loop that perturbs buf[0...0] and reduces sum(y*y)
    # over the ENTIRE output. A chain that only touches y[0] (gen 3's
    # silent failure) diverges from this immediately.
    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    rl = _load_roofline()
    cls = SMALL_CLASS
    rng = np.random.RandomState(0)
    lhs = jnp.asarray(rng.uniform(size=cls["lhs"][0]).astype(np.float32))
    rhs = jnp.asarray(
        (rng.uniform(size=cls["rhs"][0]) * 0.1).astype(np.float32))
    dn = lax.ConvDimensionNumbers(*(tuple(d) for d in cls["dn"]))

    def one_lr(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=dn)

    iters = 3
    fn = rl._chained_scan_fn(cls, lhs, rhs, one_lr, iters)
    got = float(fn(jnp.float32(0.0), lhs, rhs))

    # reference loop (rhs is the smaller operand -> it carries the chain)
    buf = np.asarray(rhs).copy()
    orig0 = buf.reshape(-1)[0]
    s = 0.0
    for _ in range(iters):
        buf.reshape(-1)[0] = np.float32(orig0 + s * 1e-30)
        y = np.asarray(one_lr(lhs, jnp.asarray(buf)))
        s = float((y.astype(np.float64) ** 2).sum())
    np.testing.assert_allclose(got, s, rtol=1e-4)


def test_impossible_timing_is_flagged():
    rl = _load_roofline()
    cls = dict(SMALL_CLASS)
    # 1.18 MFLOP in 1 ns -> ~1180 TFLOP/s, way over any chip peak.
    assert rl.implied_tflops(cls, 1e-6) > 1.15 * rl.PEAK_FLOPS / 1e12
    # A sane timing stays under the guard: the bound itself implies
    # at most the peak by construction.
    sane_ms = cls["flops"] / rl.PEAK_FLOPS * 1e3
    assert rl.implied_tflops(cls, sane_ms) <= 1.15 * rl.PEAK_FLOPS / 1e12
