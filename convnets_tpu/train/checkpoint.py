"""Checkpointing — versioned, full-state, single-file.

Reproduces the reference checkpoint semantics (basemodel.py:834-948):
  * one file per checkpoint holding {epoch_results, settings, params,
    BN stats, optimizer moments, scheduler state, loss scale}
  * path `<output_dir>/<ModelName><kind>-<unix-ts-version>-<suffix>` with
    suffix ∈ {best_loss, best_score, tuned}
  * get_last_checkpoint scans the output dir for the highest version of a
    given model name.

Format: a numpy .npz (zip) — arrays stored under 'arr/<path>' keys (pytree
paths joined with '/'), JSON metadata under '__meta__'. Device arrays are
pulled to host once; loading produces plain numpy that jit re-shards.
"""

from __future__ import annotations

import io
import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np
import jax

SUFFIX_BEST_LOSS = "best_loss"
SUFFIX_BEST_SCORE = "best_score"
SUFFIX_TUNED = "tuned"
EXT = ".ckpt.npz"


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif hasattr(tree, "_fields"):  # NamedTuple (AdamState etc.)
        for k in tree._fields:
            out.update(flatten_tree(getattr(tree, k), f"{prefix}{k}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def checkpoint_path(output_dir: str, model_name: str, version: int, suffix: str) -> str:
    return os.path.join(output_dir, f"{model_name}-{version}-{suffix}{EXT}")


def save_checkpoint(path: str, *, params, model_state, opt_state, lr, loss_scale,
                    epoch_results: dict, settings_dict: dict, scheduler_state: dict,
                    optimizer_name: str, extra: dict | None = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for name, tree in (("params", params), ("model_state", model_state),
                       ("opt_state", opt_state)):
        for k, v in flatten_tree(tree, f"{name}/").items():
            arrays["arr/" + k] = v
    arrays["arr/lr"] = np.asarray(lr)
    arrays["arr/loss_scale"] = np.asarray(loss_scale)

    meta = {
        "epoch_results": epoch_results,
        "settings": _jsonable(settings_dict),
        "scheduler": scheduler_state,
        "optimizer": optimizer_name,
        "extra": _jsonable(extra or {}),
        "format_version": 1,
    }
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             **arrays)
    # atomic publish: the write may run on the async checkpoint thread
    # while other processes (resume scripts, get_models_scores scans) read
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    return path


def load_checkpoint(path: str) -> Tuple[dict, dict]:
    """Returns (trees, meta): trees has params/model_state/opt_state/lr/loss_scale."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        flat = {k[len("arr/"):]: z[k] for k in z.files if k.startswith("arr/")}
    nested = unflatten_tree(flat)
    trees = {
        "params": nested.get("params", {}),
        "model_state": nested.get("model_state", {}),
        "opt_state": nested.get("opt_state", {}),
        "lr": nested.get("lr"),
        "loss_scale": nested.get("loss_scale"),
    }
    return trees, meta


def rebuild_opt_state(nested: dict, optimizer_name: str):
    """Reconstruct the optimizer NamedTuple from its dict form."""
    from convnets_tpu.train.optim import AdamState, SGDState

    if optimizer_name == "adam":
        return AdamState(count=nested["count"], mu=nested["mu"], nu=nested["nu"])
    if optimizer_name == "sgd":
        return SGDState(momentum=nested["momentum"])
    raise ValueError(optimizer_name)


def get_last_checkpoint(output_dir: str, model_name: str) -> str | None:
    """Highest-version checkpoint for this model (reference basemodel.py:892-915)."""
    if not os.path.isdir(output_dir):
        return None
    pat = re.compile(re.escape(model_name) + r"-(\d+)-(\w+)" + re.escape(EXT) + "$")
    best = None
    for fname in os.listdir(output_dir):
        m = pat.match(fname)
        if m:
            version = int(m.group(1))
            if best is None or version > best[0]:
                best = (version, os.path.join(output_dir, fname))
    return best[1] if best else None


def average_trees(trees):
    """Uniform average of same-structure pytrees of arrays (SWA-style tail
    averaging of the cosine endgame; Izmailov et al. 2018). Integer leaves
    (e.g. step counters) are taken from the first tree. Averaged BN running
    stats are NOT meaningful for averaged weights — re-estimate them with
    Trainer.reestimate_bn afterwards."""
    if not trees:
        raise ValueError("average_trees() needs at least one tree")
    flats = [flatten_tree(t) for t in trees]
    keys = flats[0].keys()
    out = {}
    for k in keys:
        first = np.asarray(flats[0][k])
        if np.issubdtype(first.dtype, np.integer):
            out[k] = first
        else:
            acc = np.zeros(first.shape, np.float64)
            for f in flats:
                acc += np.asarray(f[k], np.float64)
            out[k] = (acc / len(flats)).astype(first.dtype)
    return unflatten_tree(out)


def ema_trees(trees, decay=0.9):
    """Exponentially-weighted average of an ordered sequence of pytrees
    (oldest first): ema <- decay*ema + (1-decay)*tree. A recency-weighted
    variant of `average_trees` for cosine-tail snapshot averaging — later
    snapshots (lower lr, flatter minima) dominate. Integer leaves are taken
    from the LAST tree (freshest step counters). Re-estimate BN running
    stats afterwards, same as `average_trees`."""
    if not trees:
        raise ValueError("ema_trees() needs at least one tree")
    if not (0.0 <= decay < 1.0):
        raise ValueError(f"decay must be in [0, 1), got {decay}")
    flats = [flatten_tree(t) for t in trees]
    out = {}
    for k in flats[0].keys():
        last = np.asarray(flats[-1][k])
        if np.issubdtype(last.dtype, np.integer):
            out[k] = last
        else:
            acc = np.asarray(flats[0][k], np.float64)
            for f in flats[1:]:
                acc = decay * acc + (1.0 - decay) * np.asarray(f[k], np.float64)
            out[k] = acc.astype(last.dtype)
    return unflatten_tree(out)


def _jsonable(obj: Any):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, jax.Array):
        return np.asarray(obj).tolist()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return repr(obj)  # distributions / device objects etc.
