"""Pallas kernel parity vs the lax-backed ops oracle (interpret mode on
CPU — the same kernels lower through Mosaic on a real TPU). SURVEY.md §4
test pyramid layer (a)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convnets_tpu import ops
from convnets_tpu.ops.pallas import (
    avg_pool2d, conv2d_fused, depthwise_conv2d, max_pool2d,
)

RTOL = 1e-5
ATOL = 1e-5


def rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1), (2, 3, 7), (2, 0, 1), (2, 1, 1)])
def test_conv2d_fused_matches_lax(stride, padding, k):
    x = rand(0, (4, 16, 16, 8))
    w = rand(1, (k, k, 8, 32)) * 0.1
    got = conv2d_fused(x, w, stride=stride, padding=padding, interpret=True)
    want = ops.conv2d(x, w, stride=stride, padding=padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv2d_fused_epilogue_matches_bn_relu():
    """conv → BN(inference) → ReLU == conv2d_fused with folded scale/shift."""
    x = rand(0, (2, 8, 8, 4))
    w = rand(1, (3, 3, 4, 16)) * 0.1
    mean = rand(2, (16,)) * 0.1
    var = jnp.abs(rand(3, (16,))) + 0.5
    gamma = rand(4, (16,)) * 0.5 + 1.0
    beta = rand(5, (16,)) * 0.1
    eps = 1e-5

    y = ops.conv2d(x, w, stride=1, padding=1)
    want = ops.relu(ops.batch_norm_inference(y, mean, var, gamma, beta, eps=eps))

    scale = gamma / jnp.sqrt(var + eps)
    shift = beta - mean * scale
    got = conv2d_fused(x, w, scale, shift, stride=1, padding=1, relu=True,
                       interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1)])
def test_depthwise_matches_lax(stride, padding):
    x = rand(0, (4, 16, 16, 16))
    w = rand(1, (3, 3, 1, 16)) * 0.2
    got = depthwise_conv2d(x, w, stride=stride, padding=padding, interpret=True)
    want = ops.conv2d_depthwise(x, w, stride=stride, padding=padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_max_pool_matches_lax(k, stride, padding):
    x = rand(0, (4, 16, 16, 8))
    got = max_pool2d(x, k, stride, padding, interpret=True)
    want = ops.max_pool2d(x, k, stride, padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (3, 2, 1)])
def test_avg_pool_matches_lax(k, stride, padding):
    x = rand(0, (4, 16, 16, 8))
    got = avg_pool2d(x, k, stride, padding, interpret=True)
    want = ops.avg_pool2d(x, k, stride, padding)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv2d_fused_bf16():
    x = rand(0, (2, 8, 8, 8)).astype(jnp.bfloat16)
    w = (rand(1, (3, 3, 8, 16)) * 0.1).astype(jnp.bfloat16)
    got = conv2d_fused(x, w, stride=1, padding=1, interpret=True)
    want = ops.conv2d(x, w, stride=1, padding=1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0.1, atol=0.1)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (2, 0, 1)])
def test_conv2d_stats_matches_lax(stride, padding, k):
    from convnets_tpu.ops.pallas import conv2d_stats

    x = rand(0, (4, 16, 16, 8))
    w = rand(1, (k, k, 8, 32)) * 0.1
    y, s1, s2 = conv2d_stats(x, w, stride=stride, padding=padding,
                             interpret=True)
    want = ops.conv2d(x, w, stride=stride, padding=padding)
    np.testing.assert_allclose(y, want, rtol=RTOL, atol=ATOL)
    wf = np.asarray(want, np.float64)
    np.testing.assert_allclose(s1, wf.sum(axis=(0, 1, 2)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(s2, (wf * wf).sum(axis=(0, 1, 2)), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("groups,stride", [(4, 1), (8, 2), (32, 1)])
def test_grouped_conv_train_matches_lax(groups, stride):
    from convnets_tpu.ops.pallas import grouped_conv2d_train

    cin, cout = groups * 4, groups * 8
    x = rand(0, (2, 8, 8, cin))
    w = rand(1, (3, 3, 4, cout)) * 0.1
    got = grouped_conv2d_train(x, w, groups, stride, 1, True)
    want = ops.conv2d(x, w, stride=stride, padding=1, groups=groups)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # gradients flow through the lax grouped transpose, never the dense blocks
    def f_pal(x_, w_):
        return jnp.sum(grouped_conv2d_train(x_, w_, groups, stride, 1, True) ** 2)

    def f_lax(x_, w_):
        return jnp.sum(ops.conv2d(x_, w_, stride=stride, padding=1,
                                  groups=groups) ** 2)

    gx_p, gw_p = jax.grad(f_pal, argnums=(0, 1))(x, w)
    gx_l, gw_l = jax.grad(f_lax, argnums=(0, 1))(x, w)
    assert gw_p.shape == w.shape
    np.testing.assert_allclose(gx_p, gx_l, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gw_p, gw_l, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("groups,stride,relu", [(1, 1, True), (1, 2, True),
                                                (1, 1, False), (4, 1, True)])
def test_conv_bn_relu_train_matches_unfused(groups, stride, relu):
    """Fused conv+BN+ReLU: forward AND all four gradients match the
    unfused conv2d → batch_norm_train → relu oracle in fp32."""
    from convnets_tpu.ops.pallas import conv_bn_relu_train

    cin, cout = 8 * groups, 16 * groups
    eps = 1e-5
    x = rand(0, (4, 8, 8, cin))
    w = rand(1, (3, 3, cin // groups, cout)) * 0.2
    gamma = rand(2, (cout,)) * 0.3 + 1.0
    beta = rand(3, (cout,)) * 0.2
    probe = rand(4, (4, 8 // stride, 8 // stride, cout))
    rm, rv = jnp.zeros((cout,)), jnp.ones((cout,))

    def fused(x_, w_, g_, b_):
        out, mean, var = conv_bn_relu_train(x_, w_, g_, b_, stride, 1,
                                            groups, eps, relu, True)
        return out, mean, var

    def unfused(x_, w_, g_, b_):
        y = ops.conv2d(x_, w_, stride=stride, padding=1, groups=groups)
        out, nm, nv = ops.batch_norm_train(y, rm, rv, g_, b_, eps=eps)
        if relu:
            out = ops.relu(out)
        return out, nm, nv

    out_f, mean_f, var_f = fused(x, w, gamma, beta)
    out_u, _, _ = unfused(x, w, gamma, beta)
    np.testing.assert_allclose(out_f, out_u, rtol=1e-4, atol=1e-4)

    yf = np.asarray(ops.conv2d(x, w, stride=stride, padding=1, groups=groups),
                    np.float64)
    np.testing.assert_allclose(mean_f, yf.mean(axis=(0, 1, 2)), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(var_f, yf.var(axis=(0, 1, 2)), rtol=1e-3,
                               atol=1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a)[0] * probe)

    grads_f = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    grads_u = jax.grad(loss(unfused), argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for gf, gu, name in zip(grads_f, grads_u, ("dx", "dw", "dgamma", "dbeta")):
        np.testing.assert_allclose(gf, gu, rtol=2e-3, atol=2e-3,
                                   err_msg=name)


@pytest.mark.parametrize("groups", [1, 4])
def test_conv_bn_relu_layer_dispatch(monkeypatch, groups):
    """conv_block (ConvBNReLU) fused path == unfused Sequential path:
    output, running-stat updates, and parameter gradients, train and eval."""
    from jax.experimental.pallas import tpu as pltpu
    from convnets_tpu.ops import pallas as P
    from convnets_tpu import nn

    cin = 8 * groups
    block = nn.conv_block(16 * groups, 3, stride=1, padding=1, groups=groups)
    assert isinstance(block, nn.ConvBNReLU)
    x = rand(0, (4, 8, 8, cin))
    v = block.init(jax.random.key(0), x.shape)

    out_lax, ns_lax = block.apply(v, x, train=True)
    ev_lax, _ = block.apply(v, x, train=False)

    def loss(params):
        y, _ = block.apply({"params": params, "state": v["state"]}, x,
                           train=True)
        return jnp.sum(y ** 2)

    g_lax = jax.grad(loss)(v["params"])

    monkeypatch.setattr(P, "enabled", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out_pal, ns_pal = block.apply(v, x, train=True)
        ev_pal, _ = block.apply(v, x, train=False)
        g_pal = jax.grad(loss)(v["params"])

    np.testing.assert_allclose(out_pal, out_lax, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ev_pal, ev_lax, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ns_pal["1"]["mean"], ns_lax["1"]["mean"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ns_pal["1"]["var"], ns_lax["1"]["var"],
                               rtol=1e-3, atol=1e-4)
    for path in (("0", "w"), ("1", "scale"), ("1", "bias")):
        gp, gl = g_pal[path[0]][path[1]], g_lax[path[0]][path[1]]
        np.testing.assert_allclose(gp, gl, rtol=2e-3, atol=2e-3,
                                   err_msg=str(path))


def test_layer_dispatch_interpret(monkeypatch):
    """Conv2d/pool layers route through the Pallas kernels when enabled
    (forced interpret mode on CPU) and still match the lax path."""
    from jax.experimental.pallas import tpu as pltpu
    from convnets_tpu.ops import pallas as P
    from convnets_tpu import nn
    from convnets_tpu.nn.module import Module  # noqa: F401

    conv = nn.Conv2d(16, 3, stride=1, padding=1, bias=True)
    pool = nn.MaxPool2d(2, stride=2)
    x = rand(0, (4, 8, 8, 8))
    v = conv.init(jax.random.key(0), x.shape)

    y_lax, _ = conv.apply(v, x)
    p_lax, _ = pool.apply(None, y_lax)

    monkeypatch.setattr(P, "enabled", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        y_pal, _ = conv.apply(v, x)
        p_pal, _ = pool.apply(None, y_pal)
        # gradient flows through the custom VJP
        g = jax.grad(lambda w: jnp.sum(
            conv.apply({"params": {"w": w, "b": v["params"]["b"]}, "state": {}}, x)[0] ** 2
        ))(v["params"]["w"])
    np.testing.assert_allclose(y_pal, y_lax, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_pal, p_lax, rtol=1e-5, atol=1e-5)
    assert g.shape == v["params"]["w"].shape


@pytest.mark.parametrize("mode", ["max", "avg"])
def test_pool2d_train_fwd_and_grad(mode):
    from convnets_tpu.ops.pallas import pool2d_train

    x = rand(0, (4, 16, 16, 8))
    lax_fn = ops.max_pool2d if mode == "max" else ops.avg_pool2d
    got = pool2d_train(x, mode, 3, 2, 1, True)
    want = lax_fn(x, 3, 2, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    g_pal = jax.grad(lambda x_: jnp.sum(pool2d_train(x_, mode, 3, 2, 1, True) ** 2))(x)
    g_lax = jax.grad(lambda x_: jnp.sum(lax_fn(x_, 3, 2, 1) ** 2))(x)
    np.testing.assert_allclose(g_pal, g_lax, rtol=1e-4, atol=1e-4)


def test_pool_large_spatial_falls_back():
    """ImageNet-scale pools exceed the scoped-VMEM stack (measured ~50 MB
    at RN50's 114×114×64) — the kernel must fall back to reduce_window
    instead of emitting an uncompilable pallas_call."""
    x = rand(0, (2, 114, 114, 64))
    got = max_pool2d(x, 3, 2, 1)
    want = ops.max_pool2d(x, 3, 2, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------- OH tiling

def test_tiled_conv_matches_lax():
    """Direct slab-tiled launch (grid over batch × OH slabs) vs the oracle."""
    from convnets_tpu.ops.pallas import conv as pconv

    x = rand(10, (4, 14, 14, 8))
    w = rand(11, (3, 3, 8, 16)) * 0.1
    xp = pconv._pad_to_extent(x, 1, 1, 16, 16)
    got = pconv._conv2d_tiled(
        xp, jnp.reshape(w, (9, 8, 16)),
        jnp.ones((1, 16), jnp.float32), jnp.zeros((1, 16), jnp.float32),
        kh=3, kw=3, oh=14, ow=14, bt=2, th=7, relu=False, epilogue=False,
        stats=False, interpret=True)
    want = ops.conv2d(x, w, stride=1, padding=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tiled_conv_stats_matches_lax():
    from convnets_tpu.ops.pallas import conv as pconv

    x = rand(12, (2, 8, 8, 4))
    w = rand(13, (3, 3, 4, 8)) * 0.1
    xp = pconv._pad_to_extent(x, 1, 1, 10, 10)
    y, s1, s2 = pconv._conv2d_tiled(
        xp, jnp.reshape(w, (9, 4, 8)), None, None,
        kh=3, kw=3, oh=8, ow=8, bt=1, th=4, relu=False, epilogue=False,
        stats=True, interpret=True)
    want = ops.conv2d(x, w, stride=1, padding=1)
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s1, wf.sum((0, 1, 2)), rtol=1e-4)
    np.testing.assert_allclose(s2, (wf * wf).sum((0, 1, 2)), rtol=1e-4)


def test_large_spatial_dispatches_to_tiled():
    """A 112×112×64 f32 sample overflows the whole-sample VMEM budget; the
    public entry points must now route to the tiled kernel (r2 fell back
    to XLA for every such shape) and still match the oracle."""
    from convnets_tpu.ops.pallas import conv as pconv

    x = rand(20, (2, 112, 112, 64)) * 0.1
    w = rand(21, (3, 3, 64, 64)) * 0.05
    assert pconv._pick_slab_tiles(2, 112, 112, 3, 114, 64, 64, 4) is not None
    got = conv2d_fused(x, w, stride=1, padding=1, interpret=True)
    want = ops.conv2d(x, w, stride=1, padding=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tiled_slab_picker_covers_rn50_shapes():
    """Every distinct RN50@224 conv shape (post space-to-depth for the
    stride-2 ones) must be expressible: whole-sample fit OR slab tiling
    (i.e. the kernels never bail to XLA at the flagship shapes)."""
    from convnets_tpu.ops.pallas import conv as pconv

    shapes = [  # (H_in_effective, kh, IWp, Cin, Cout) seen by the kernel
        (112, 4, 115, 12, 64),     # stem 7x7/2 after s2d
        (56, 1, 56, 64, 64), (56, 3, 58, 64, 64), (56, 1, 56, 64, 256),
        (56, 1, 56, 256, 128), (28, 2, 58, 512, 128),  # 3x3/2 s2d
        (28, 1, 28, 512, 128), (28, 3, 30, 128, 128),
        (14, 2, 30, 1024, 256), (14, 1, 14, 1024, 256), (14, 3, 16, 256, 256),
        (7, 2, 16, 2048, 512), (7, 1, 7, 2048, 512), (7, 3, 9, 512, 512),
        (7, 1, 7, 512, 2048),
    ]
    for oh, kh, iwp, cin, cout in shapes:
        tiles = pconv._pick_slab_tiles(256, oh, iwp - kh + 1, kh, iwp, cin,
                                       cout, 2)
        assert tiles is not None, (oh, kh, iwp, cin, cout)


def test_vmem_pickers_count_resident_weight():
    """r3 regression (in-context scoped-VMEM OOM): both tile pickers must
    include the grid-resident weight in the working-set estimate. The
    pre-decimation l4 shortcut (s2d-expanded 1x1: Cin 4096 -> Cout 2048,
    16.8 MB bf16 weight) exceeds the slab budget outright, and the 7x7x512
    k3 shape must leave the whole-sample regime (its Mosaic stack measured
    16.21 MB in-context vs the 16 MB limit)."""
    from convnets_tpu.ops.pallas import conv as pconv

    assert pconv._pick_slab_tiles(256, 7, 7, 1, 7, 4096, 2048, 2) is None

    it, oh = 2, 7
    bt = pconv._pick_batch_tile(256, 9, 9, 512, 512, oh, oh, it, fudge=2.0,
                                kk=9)
    ps = 9 * 9 * 512 * it + oh * oh * 512 * (it + 4)
    stack = bt * ps + 9 * bt * oh * oh * 512 * it + 9 * 512 * 512 * it
    assert not pconv._whole_sample_ok(oh, oh, 512, bt, ps, stack)
    # ...and the slab path must still cover it
    assert pconv._pick_slab_tiles(256, oh, oh, 3, 9, 512, 512, it) is not None


def test_decimate_1x1_stride2_lowering():
    """1x1 stride-2 convs must decimate the input (quarter-size stride-1
    conv) rather than space-to-depth to 4*Cin (3/4 structural zeros)."""
    from convnets_tpu.ops.pallas import conv as pconv

    x = rand(0, (2, 14, 14, 16))
    got = pconv._decimate_1x1_stride2(x, 0, 0, 7, 7)
    np.testing.assert_array_equal(got, np.asarray(x)[:, ::2, ::2, :])
    got = pconv._decimate_1x1_stride2(x, 1, 1, 8, 8)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    np.testing.assert_array_equal(got, xp[:, :16:2, :16:2, :])


@pytest.mark.parametrize("h,c,stride", [(112, 64, 1), (112, 128, 2)])
def test_depthwise_large_spatial_tiled(h, c, stride):
    """224-class depthwise shapes (MobileNet stress config) overflow the
    whole-sample VMEM budget and must route through the OH-slab tiling."""
    from convnets_tpu.ops.pallas import conv as pconv

    x = rand(30, (2, h, h, c)) * 0.1
    w = rand(31, (3, 3, 1, c)) * 0.1
    got = pconv.depthwise_conv2d(x, w, stride=stride, padding=1, interpret=True)
    want = ops.conv2d_depthwise(x, w, stride=stride, padding=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_auto_routing_table(monkeypatch):
    """mode 'auto' routes only the measured win shapes to Pallas; '1'
    routes everything that fits; '0' disables. route_aux (depthwise/
    grouped/pool, no A/B table) rides only under '1'."""
    from convnets_tpu.ops import pallas
    from convnets_tpu.ops.pallas import routing

    monkeypatch.setenv("CONVNETS_TPU_PALLAS", "auto")
    assert pallas.mode() == "auto"
    assert not pallas.route_aux()
    # measured train win (l4.expand) routes; measured loss (stem) does not
    assert pallas.route_conv(7, 512, 2048, 1, 1, train=True)
    assert not pallas.route_conv(224, 3, 64, 7, 2, train=True)
    # unmeasured shape defaults to XLA
    assert not pallas.route_conv(31, 99, 17, 5, 1, train=True)
    # eval table is separate: l3.spatial wins eval only
    assert pallas.route_conv(14, 256, 256, 3, 1, train=False)
    assert not pallas.route_conv(14, 256, 256, 3, 1, train=True)

    monkeypatch.setenv("CONVNETS_TPU_PALLAS", "1")
    assert pallas.route_conv(224, 3, 64, 7, 2, train=True)
    assert pallas.route_aux()

    # every committed table key matches a distinct RN50@224 conv shape
    for key in routing.TRAIN_WINS | routing.EVAL_WINS:
        h, cin, cout, k, s = key
        assert h in (224, 112, 56, 28, 14, 7) and k in (1, 3, 7) and s in (1, 2)
