"""Optimizer/scheduler parity vs torch."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from convnets_tpu.train import optim
from convnets_tpu.train.scheduler import ReduceLROnPlateau, StepDecay


def _torch_params(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(*s).astype(np.float32) for s in shapes]


def test_adam_matches_torch():
    shapes = [(4, 3), (3,), (2, 2, 3, 4)]
    init = _torch_params(shapes)
    lr, wd = 0.01, 1e-4

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    topt = torch.optim.Adam(tparams, lr=lr, weight_decay=wd)

    params = {str(i): jnp.asarray(p) for i, p in enumerate(init)}
    state = optim.adam_init(params)

    rng = np.random.RandomState(1)
    for step in range(5):
        grads_np = [rng.randn(*s).astype(np.float32) for s in shapes]
        for p, g in zip(tparams, grads_np):
            p.grad = torch.from_numpy(g.copy())
        topt.step()
        grads = {str(i): jnp.asarray(g) for i, g in enumerate(grads_np)}
        params, state = optim.adam_update(grads, state, params, lr=lr, weight_decay=wd)

    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(params[str(i)]), tp.detach().numpy(), rtol=3e-5, atol=1e-5
        )


def test_sgd_momentum_matches_torch():
    shapes = [(5, 2), (2,)]
    init = _torch_params(shapes, seed=2)
    lr, wd, mom = 0.1, 1e-4, 0.9

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    topt = torch.optim.SGD(tparams, lr=lr, weight_decay=wd, momentum=mom)

    params = {str(i): jnp.asarray(p) for i, p in enumerate(init)}
    state = optim.sgd_init(params)

    rng = np.random.RandomState(3)
    for step in range(4):
        grads_np = [rng.randn(*s).astype(np.float32) for s in shapes]
        for p, g in zip(tparams, grads_np):
            p.grad = torch.from_numpy(g.copy())
        topt.step()
        grads = {str(i): jnp.asarray(g) for i, g in enumerate(grads_np)}
        params, state = optim.sgd_update(
            grads, state, params, lr=lr, weight_decay=wd, momentum=mom
        )

    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(params[str(i)]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_clip_by_global_norm_matches_torch():
    shapes = [(3, 3), (7,)]
    rng = np.random.RandomState(4)
    grads_np = [rng.randn(*s).astype(np.float32) * 3 for s in shapes]

    tparams = [torch.nn.Parameter(torch.zeros(*s)) for s in shapes]
    for p, g in zip(tparams, grads_np):
        p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_(tparams, max_norm=1.0)

    grads = {str(i): jnp.asarray(g) for i, g in enumerate(grads_np)}
    clipped = optim.clip_by_global_norm(grads, 1.0)
    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(clipped[str(i)]), tp.grad.numpy(), rtol=1e-4, atol=1e-6
        )


def test_plateau_scheduler_matches_torch():
    lr0 = 0.1
    tparam = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tparam], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="max", factor=0.5, patience=2
    )
    sched = ReduceLROnPlateau(lr=lr0, mode="max", factor=0.5, patience=2)

    metrics = [0.1, 0.2, 0.2, 0.2, 0.2, 0.25, 0.25, 0.25, 0.25, 0.3]
    for m in metrics:
        tsched.step(m)
        lr = sched.step(m)
        assert abs(lr - topt.param_groups[0]["lr"]) < 1e-12, (m, lr)


def test_step_decay():
    sched = StepDecay(lr=1.0, step_size=2, gamma=0.1)
    lrs = [sched.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [1.0, 0.1, 0.1, 0.01, 0.01])
