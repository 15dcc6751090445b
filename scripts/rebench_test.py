"""Re-run the timed test protocol for finished campaign checkpoints on an
idle chip, and patch the RESULT jsons with the clean numbers.

The campaign's in-run test() measurements can be depressed when another
process shared the chip; this reloads each best checkpoint (the reference
process_load path, template_net.py:201-261) and repeats test() alone.

Usage: python scripts/rebench_test.py [RESULT json ...]
       (no args: every data/output/RESULT-cinic-*.json)
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def main():
    paths = sys.argv[1:] or sorted(glob.glob("data/output/RESULT-cinic-*.json"))

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train import checkpoint as ckpt
    from convnets_tpu.train.engine import Trainer

    import numpy as np

    data = None
    for path in paths:
        with open(path) as f:
            rec = json.load(f)
        cp = rec.get("checkpoint")
        if not cp or not os.path.exists(cp):
            print(f"skip {path}: checkpoint missing")
            continue
        _, meta = ckpt.load_checkpoint(cp)
        arch = meta.get("extra", {}).get("arch")
        setting = Settings(kind=meta["settings"]["kind"],
                           input_size=(3, 32, 32), num_classes=10,
                           batch_size=256, mixed_precision=True,
                           data_norm=True, data_augment=False,
                           output_dir="data/output")
        if data is None:
            data = DataMngr(setting, root=CINIC_ROOT)
        model = build_model(arch, setting)
        trainer = Trainer(model)
        trainer.load_checkpoint(cp)
        testset = data.load_test()
        scores, times, fps = trainer.test(testset)
        cm = np.asarray(trainer.confusion_matrix)
        top1 = float(np.trace(cm)) / float(cm.sum()) * 100.0
        rec["test_top1_pct"] = round(top1, 2)
        rec["test_throughput_img_s"] = round(float(fps), 1)
        rec["rebench"] = True
        with open(path, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"{rec['config']}: top1={top1:.2f}% fps={fps:.0f} -> {path}")


if __name__ == "__main__":
    main()
