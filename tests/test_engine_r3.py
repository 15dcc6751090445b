"""Round-3 engine features: BN re-estimation, tail weight averaging,
epoch hooks, uninitialized-state guards, per-image latency stats, per-host
metric accounting, and deterministic loader shutdown (r2 VERDICT
next-steps #3, #5, #7)."""

import threading
import time

import numpy as np
import jax
import pytest

from convnets_tpu.data import DataLoader, synthetic_dataset
from convnets_tpu.models import build_model
from convnets_tpu.settings import Settings
from convnets_tpu.train import Trainer
from convnets_tpu.train import checkpoint as ckpt


def make_setting(tmp_path, **kw):
    kw.setdefault("batch_size", 16)
    kw.setdefault("epochs", 2)
    kw.setdefault("learning_rate", 1e-3)
    kw.setdefault("mixed_precision", False)
    kw.setdefault("data_augment", False)
    kw.setdefault("data_norm", False)
    kw.setdefault("early_stop", False)
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("output_dir", str(tmp_path))
    return Settings(kind=0, input_size=(3, 16, 16), num_classes=4, **kw)


def make_loaders(n_train=64, n_valid=32, batch=16):
    train = DataLoader(synthetic_dataset(n_train, (16, 16, 3), 4, seed=0),
                       batch, shuffle=True, seed=0)
    valid = DataLoader(synthetic_dataset(n_valid, (16, 16, 3), 4, seed=1),
                       batch, shuffle=False)
    return train, valid


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r3")
    setting = make_setting(tmp)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)
    return trainer, setting, train, valid


# ---------------------------------------------------------------- BN refresh

def test_reestimate_bn_updates_stats_not_params(tmp_path):
    setting = make_setting(tmp_path)
    model = build_model("convnet", setting)  # has BN layers
    trainer = Trainer(model)
    train, valid = make_loaders()
    trainer.fit(train, valid)

    params_before = jax.device_get(trainer.state.params)
    state_before = jax.device_get(trainer.state.model_state)
    trainer.reestimate_bn(train, passes=1, info=False)
    params_after = jax.device_get(trainer.state.params)
    state_after = jax.device_get(trainer.state.model_state)

    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(a, b)
    diffs = [float(np.max(np.abs(a - b)))
             for a, b in zip(jax.tree.leaves(state_before),
                             jax.tree.leaves(state_after))]
    assert max(diffs) > 0  # running stats moved

    # trainer still evaluates fine with refreshed stats
    score = trainer.evaluate(valid, info=False)
    assert 0.0 <= score <= 1.0


def test_reestimate_bn_requires_state(tmp_path):
    setting = make_setting(tmp_path)
    trainer = Trainer(build_model("convnet", setting))
    train, _ = make_loaders()
    with pytest.raises(RuntimeError, match="fit\\(\\) or"):
        trainer.reestimate_bn(train)


# ------------------------------------------------------------ state guards

def test_evaluate_raises_uninitialized(tmp_path):
    setting = make_setting(tmp_path)
    trainer = Trainer(build_model("lenet", setting))
    _, valid = make_loaders()
    with pytest.raises(RuntimeError, match="load_checkpoint"):
        trainer.evaluate(valid)
    with pytest.raises(RuntimeError, match="load_checkpoint"):
        trainer.test(valid)
    # explicit opt-in still allowed (random-weight scoring on purpose)
    trainer.init_state()
    assert 0.0 <= trainer.evaluate(valid, info=False) <= 1.0


# ------------------------------------------------------------- latency stats

def test_inference_time_excludes_partial_batches(fitted):
    trainer, _, _, _ = fitted
    bs = trainer.setting.batch_size
    times = np.array([0.1, 0.1, 0.1, 0.5])  # last = padded partial batch
    full = np.array([True, True, True, False])
    total, mean, std, fps = trainer.inference_time(
        times, num_images=3 * bs + 1, info=False, full_batches=full)
    assert total == pytest.approx(0.8)
    assert mean == pytest.approx(0.1 / bs)   # slow partial batch excluded
    assert std == pytest.approx(0.0)
    assert fps == pytest.approx((3 * bs + 1) / 0.8)
    # without the mask: reference formula over all batches
    _, mean_all, std_all, _ = trainer.inference_time(
        times, num_images=3 * bs + 1, info=False)
    assert mean_all == pytest.approx(np.mean(times / bs))
    assert std_all > 0


# ------------------------------------------------------------- tail averaging

def test_average_trees():
    t1 = {"a": {"w": np.ones((2, 2), np.float32)}, "count": np.int32(3)}
    t2 = {"a": {"w": 3 * np.ones((2, 2), np.float32)}, "count": np.int32(5)}
    avg = ckpt.average_trees([t1, t2])
    np.testing.assert_allclose(avg["a"]["w"], 2 * np.ones((2, 2)))
    assert avg["count"] == 3  # integer leaves come from the first tree
    assert avg["a"]["w"].dtype == np.float32


def test_ema_trees():
    t1 = {"a": {"w": np.zeros((2, 2), np.float32)}, "count": np.int32(3)}
    t2 = {"a": {"w": np.ones((2, 2), np.float32)}, "count": np.int32(5)}
    t3 = {"a": {"w": 2 * np.ones((2, 2), np.float32)}, "count": np.int32(7)}
    ema = ckpt.ema_trees([t1, t2, t3], decay=0.5)
    # 0 -> 0.5*0 + 0.5*1 = 0.5 -> 0.5*0.5 + 0.5*2 = 1.25
    np.testing.assert_allclose(ema["a"]["w"], 1.25 * np.ones((2, 2)))
    assert ema["count"] == 7  # integer leaves come from the LAST tree
    assert ema["a"]["w"].dtype == np.float32
    # single tree: identity
    one = ckpt.ema_trees([t2], decay=0.9)
    np.testing.assert_allclose(one["a"]["w"], t2["a"]["w"])
    with pytest.raises(ValueError):
        ckpt.ema_trees([], decay=0.9)
    with pytest.raises(ValueError):
        ckpt.ema_trees([t1], decay=1.0)


def test_epoch_hook_called(tmp_path):
    setting = make_setting(tmp_path, epochs=3)
    trainer = Trainer(build_model("lenet", setting))
    train, valid = make_loaders()
    seen = []
    trainer.epoch_hook = lambda tr, epoch: seen.append(epoch)
    trainer.fit(train, valid)
    assert seen == [0, 1, 2]


def test_tail_average_pipeline(tmp_path):
    """The full SWA-style flow: collect tail params via the hook, average,
    install, BN-refresh, evaluate."""
    setting = make_setting(tmp_path, epochs=3)
    trainer = Trainer(build_model("convnet", setting))
    train, valid = make_loaders()
    tail = []
    trainer.epoch_hook = lambda tr, e: tail.append(
        jax.tree.map(np.asarray, jax.device_get(tr.state.params)))
    trainer.fit(train, valid)
    assert len(tail) == 3
    avg = ckpt.average_trees(tail)
    assert jax.tree.structure(avg) == jax.tree.structure(
        jax.device_get(trainer.state.params))
    trainer.state = trainer.state._replace(params=jax.device_put(avg))
    trainer.reestimate_bn(train, passes=1, info=False)
    score = trainer.evaluate(valid, info=False)
    assert 0.0 <= score <= 1.0


# ----------------------------------------------------- per-host accounting

def test_multihost_metric_accounting(tmp_path):
    """Per-host epoch metrics must divide by the host-local example count:
    the weighted average of per-host means equals the single-host mean
    (r2 VERDICT weak #3)."""
    setting = make_setting(tmp_path)
    model = build_model("lenet", setting)
    trainer = Trainer(model)
    ds = synthetic_dataset(48, (16, 16, 3), 4, seed=2)
    full = DataLoader(ds, 16, shuffle=False)
    trainer.init_state()

    loss_full, score_full = trainer._run_eval_epoch(full)

    parts = []
    for host in range(2):
        shard = DataLoader(ds, 16, shuffle=False, host_id=host, num_hosts=2)
        n = shard._host_count()
        loss_h, score_h = trainer._run_eval_epoch(shard)
        parts.append((n, loss_h, score_h))
    total = sum(n for n, _, _ in parts)
    loss_merged = sum(n * l for n, l, _ in parts) / total
    score_merged = sum(n * s for n, _, s in parts) / total
    assert loss_merged == pytest.approx(loss_full, rel=1e-5)
    assert score_merged == pytest.approx(score_full, rel=1e-5)


# ------------------------------------------------------------ loader shutdown

def _producer_threads():
    return [t for t in threading.enumerate() if not t.daemon or True]


def test_abandoned_iterator_shuts_down_producer():
    ds = synthetic_dataset(256, (8, 8, 3), 4, seed=3)
    baseline = threading.active_count()
    for _ in range(5):
        loader = DataLoader(ds, 8, shuffle=False, num_prefetch=1)
        it = iter(loader)
        next(it)  # take one batch, abandon the rest (sanity_check pattern)
        it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline + 1


def test_abandoned_iterator_with_workers_shuts_down():
    ds = synthetic_dataset(256, (8, 8, 3), 4, seed=4)
    baseline = threading.active_count()
    for _ in range(3):
        loader = DataLoader(ds, 8, shuffle=False, num_prefetch=1, num_workers=4)
        it = iter(loader)
        next(it)
        it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline + 1


def test_full_iteration_still_works():
    ds = synthetic_dataset(40, (8, 8, 3), 4, seed=5)
    loader = DataLoader(ds, 16, shuffle=True, seed=7, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    ws = np.concatenate([w for _, _, w in batches])
    assert ws.sum() == 40  # padding zero-weighted, all examples seen


def test_async_checkpoint_barrier(tmp_path):
    """save_checkpoint(block=False) runs the write on the ckpt-writer
    thread; load_checkpoint must barrier on it so an immediate read sees
    the complete (atomically-published) file."""
    from convnets_tpu.data.datasets import synthetic_dataset
    from convnets_tpu.data.loader import DeviceCacheLoader

    setting = Settings(kind=0, input_size=(3, 16, 16), num_classes=4,
                       batch_size=8, epochs=1, early_stop=False,
                       output_dir=str(tmp_path))
    model = build_model("lenet", setting)
    t = Trainer(model)
    t.init_state()
    t.init_optimizer()
    t.epoch_results = None
    path = t.save_checkpoint(block=False)
    t2 = Trainer(build_model("lenet", setting))
    # same-object barrier: t.load_checkpoint waits for t's own write
    meta = t.load_checkpoint(path=path)
    assert meta["optimizer"] == t.optimizer_name
    # the async write also survives fit(): improving epochs save async and
    # the end-of-fit history merge reads the file back
    ds = synthetic_dataset(32, image_shape=(16, 16, 3), num_classes=4)
    tr = DeviceCacheLoader(ds, 8, shuffle=True)
    va = DeviceCacheLoader(ds, 8)
    t2.fit(tr, va)
    assert t2.epoch_results["total_epochs"] == 1
