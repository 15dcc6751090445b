"""Utility surface — the UtilityMngr equivalents
(reference mngrutility.py:13-114).

split():                  chunk an array into fixed-size parts (the test-time
                          statistical subsampling helper, mngrutility.py:13-24 —
                          without the reference's over-iteration quirk).
set_reproducible_mode():  seed every host-side RNG; on-device randomness is
                          already deterministic via explicit PRNG keys
                          (core/rng.py), so this only needs numpy/random.
get_models_scores():      cross-model score loader for the comparison plots
                          (mngrutility.py:61-114) — scans an output dir for
                          each architecture's best/tuned checkpoint instead of
                          hard-coding file names.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np


def split(array, part_size: int) -> List:
    """Split into consecutive chunks of part_size (last may be shorter)."""
    array = list(array)
    part_size = max(int(part_size), 1)
    return [array[i:i + part_size] for i in range(0, len(array), part_size)]


def set_reproducible_mode(seed: int = 21, deterministic: bool = True) -> None:
    """Pin host-side RNGs. JAX device RNG is functional (key-derived), so the
    reference's cudnn-determinism knob has no TPU analogue to toggle: XLA:TPU
    is deterministic for a fixed program + keys."""
    random.seed(seed)
    np.random.seed(seed)


def get_models_scores(
    output_dir: str = os.path.join("data", "output"),
    archs: Optional[Sequence[str]] = None,
    make_loader=None,
) -> Dict[str, List[float]]:
    """Evaluate each architecture's latest checkpoint on its test set.

    make_loader(setting) -> test DataLoader; defaults to DataMngr.load_test.
    Returns {model_name: subset-accuracy samples} for PlotMngr.models().
    """
    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import available_models, build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train import checkpoint as ckpt
    from convnets_tpu.train.engine import Trainer

    import re

    # highest version per model_name (reference semantics,
    # basemodel.py:892-915 — same rule as checkpoint.get_last_checkpoint,
    # applied across every model in the directory)
    pat = re.compile(r"^(.+)-(\d+)-(\w+)" + re.escape(ckpt.EXT) + "$")
    # version ties across checkpoint kinds resolve by explicit preference
    # (best > tuned > last), not os.listdir enumeration order
    kind_rank = {ckpt.SUFFIX_BEST_SCORE: 3, ckpt.SUFFIX_BEST_LOSS: 3,
                 ckpt.SUFFIX_TUNED: 2}
    latest: Dict[str, tuple] = {}
    if os.path.isdir(output_dir):
        for fname in os.listdir(output_dir):
            m = pat.match(fname)
            if m:
                name, version, kind = m.group(1), int(m.group(2)), m.group(3)
                key = (version, kind_rank.get(kind, 1))
                if name not in latest or key > latest[name][0]:
                    latest[name] = (key, os.path.join(output_dir, fname))

    wanted = set(archs or available_models())
    scores: Dict[str, List[float]] = {}
    for model_name, (_, found) in sorted(latest.items()):
        _, meta = ckpt.load_checkpoint(found)
        sd = meta["settings"]
        arch = meta.get("extra", {}).get("arch")
        if arch is None:  # pre-r2 checkpoint: match the arch by model name
            flat = model_name.lower()
            cands = [a for a in available_models()
                     if flat.startswith(a.replace("_", ""))]
            arch = max(cands, key=len) if cands else None
        if arch is None or arch not in wanted:
            continue
        setting = Settings(kind=sd["kind"], input_size=sd["input_size"],
                           num_classes=sd["num_classes"])
        setting.load_values({k: v for k, v in sd.items()
                             if k in setting.get_hparams_names()})
        setting.output_dir = output_dir
        model = build_model(arch, setting)
        trainer = Trainer(model)
        trainer.load_checkpoint(found)
        loader = (make_loader(setting) if make_loader
                  else DataMngr(setting).load_test())
        subset_scores, _, _ = trainer.test(loader)
        scores[model.model_name] = [float(s) for s in subset_scores]
    return scores
