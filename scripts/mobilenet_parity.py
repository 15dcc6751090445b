"""Close the last red accuracy cell: MobileNet-v1 on CINIC-10 >= 74.39
(reference results.xlsx row 7; r2 best was 73.92).

The r2 diagnosis (CLAUDE.md): depthwise-stack BN running stats churn
mid-schedule, with huge run-to-run valid variance. This script applies the
standard countermeasures (r2 VERDICT next-steps #3):

  * post-training BN running-stat re-estimation over the train split
    (Trainer.reestimate_bn, precise-BN style);
  * SWA-style uniform averaging of the cosine-tail checkpoints
    (checkpoint.average_trees) followed by BN re-estimation;
  * multiple seeds of the best-known recipe (sgd lr 0.2, cosine, wd 5e-4).

Candidate selection happens on the VALID split; only the selected candidate
is scored on the test split (no test-set peeking).

Usage:
  python scripts/mobilenet_parity.py --refresh data/output/MobileNetV1standard-<v>-best_score.ckpt.npz
  python scripts/mobilenet_parity.py --retrain --seed 23 --epochs 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CINIC_ROOT = "/root/reference/data/CINIC-10"


def make_setting(args, seed):
    from convnets_tpu.settings import Settings

    return Settings(
        kind="standard", input_size=(3, 32, 32), num_classes=10,
        batch_size=256, epochs=args.epochs,
        learning_rate=args.lr, weight_decay=args.wd, dropout_rate=args.dropout,
        optimizer="sgd", momentum=0.9, nesterov=False,
        lr_scheduler="cosine", lr_min=1e-5, lr_warmup_epochs=5,
        data_augment=True, augment_affine=args.affine, data_norm=True,
        cutout=args.cutout, mixup=args.mixup,
        loss_reduction="mean", label_smoothing=0.0,
        early_stop=False, loss_optim=False,
        mixed_precision=True, output_dir=args.out, seed=seed,
    )


def test_top1(trainer, testset):
    import numpy as np

    scores, times, fps = trainer.test(testset)
    cm = np.asarray(trainer.confusion_matrix)
    return float(np.trace(cm)) / float(cm.sum()) * 100.0, float(fps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refresh", default=None,
                    help="checkpoint to BN-refresh and re-score (no training)")
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--tail", type=int, default=16,
                    help="number of final epochs to weight-average")
    ap.add_argument("--snap", type=int, default=32,
                    help="number of final epochs to snapshot (>= tail; the "
                         "extra snapshots feed the EMA candidate)")
    ap.add_argument("--ema-decay", type=float, default=0.9,
                    help="per-epoch decay for the exponentially-weighted "
                         "tail candidate (r4 seed-mean probe)")
    ap.add_argument("--wd", type=float, default=5e-4)
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="classifier dropout (r4 seed-mean probe: the 300ep "
                         "overfit evidence suggests regularization headroom)")
    ap.add_argument("--cutout", type=int, default=0,
                    help="device-side cutout square size (r4 probe)")
    ap.add_argument("--mixup", type=float, default=0.0,
                    help="mixup Beta(a,a) alpha (r5 probe: the one untried "
                         "recipe family, r4 VERDICT next-step #4a)")
    ap.add_argument("--affine", action="store_true",
                    help="add rotation/shear/scale augmentation on top of "
                         "crop+flip (r4 probe)")
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--data-root", default=CINIC_ROOT)
    ap.add_argument("--tag", default="r3")
    args = ap.parse_args()

    import jax  # noqa: F401  (claims the chip once, at process start)

    from convnets_tpu.data.manager import DataMngr
    from convnets_tpu.models import build_model
    from convnets_tpu.parallel.mesh import replicated
    from convnets_tpu.train import checkpoint as ckpt
    from convnets_tpu.train.engine import Trainer

    setting = make_setting(args, args.seed)
    data = DataMngr(setting, root=args.data_root)
    trainset = data.load_train()
    validset = data.load_valid()

    model = build_model("mobilenet_v1", setting)
    trainer = Trainer(model)

    record = {"config": model.model_name, "dataset": "CINIC-10",
              "tag": args.tag, "seed": args.seed, "candidates": {}}

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    def snapshot_host_params():
        return jax.tree.map(lambda a: np.asarray(a), trainer.state.params)

    rep = None if trainer.mesh is None else replicated(trainer.mesh)

    def put_replicated(tree):
        return jax.device_put(tree) if rep is None else jax.device_put(tree, rep)

    def install(params=None, model_state=None):
        kw = {}
        if params is not None:
            kw["params"] = put_replicated(params)
        if model_state is not None:
            kw["model_state"] = put_replicated(model_state)
        trainer.state = trainer.state._replace(**kw)

    tail_params = []

    if args.retrain:
        n_snap = max(args.tail, args.snap)

        def hook(tr, epoch):
            if epoch >= args.epochs - n_snap:
                tail_params.append(snapshot_host_params())

        trainer.epoch_hook = hook
        print(f"== retrain seed={args.seed} lr={args.lr} {args.epochs}ep "
              f"tail={args.tail} ==", flush=True)
        t0 = time.time()
        trainer.fit(trainset, validset)
        record["train_time_min"] = round((time.time() - t0) / 60.0, 2)
        best_ckpt_path = trainer.model_path
    elif args.refresh:
        best_ckpt_path = args.refresh
    else:
        ap.error("one of --refresh CKPT or --retrain is required")

    # ---- candidate A: best checkpoint as-is --------------------------------
    trainer.load_checkpoint(best_ckpt_path)
    # load_checkpoint re-applies saved hparams onto the live Settings
    # (reference semantics) — restore the flags this script relies on
    setting.data_augment, setting.augment_affine = True, args.affine
    setting.data_norm = True
    base_params = snapshot_host_params()
    base_state = jax.tree.map(np.asarray, trainer.state.model_state)
    acc_a = trainer.evaluate(validset, info=False)
    record["candidates"]["best"] = {"valid_pct": round(acc_a * 100, 3)}
    print(f"[valid] best ckpt:          {acc_a*100:.3f}%", flush=True)

    # ---- candidate B: best checkpoint + BN re-estimation -------------------
    trainer.reestimate_bn(trainset, passes=2)
    acc_b = trainer.evaluate(validset, info=False)
    state_b = jax.tree.map(np.asarray, trainer.state.model_state)
    record["candidates"]["best+bn"] = {"valid_pct": round(acc_b * 100, 3)}
    print(f"[valid] best ckpt + BN:     {acc_b*100:.3f}%", flush=True)

    # ---- candidate C: tail weight average + BN re-estimation ---------------
    acc_c = -1.0
    state_c = params_c = None
    if tail_params and args.tail > 0:
        params_c = ckpt.average_trees(tail_params[-args.tail:])
        install(params=params_c, model_state=base_state)
        trainer.reestimate_bn(trainset, passes=2)
        acc_c = trainer.evaluate(validset, info=False)
        state_c = jax.tree.map(np.asarray, trainer.state.model_state)
        record["candidates"]["tailavg+bn"] = {"valid_pct": round(acc_c * 100, 3)}
        print(f"[valid] tail-avg + BN:      {acc_c*100:.3f}%", flush=True)

    # ---- candidate D: exp-weighted tail average (EMA) + BN re-estimation ---
    acc_d = -1.0
    state_d = params_d = None
    if len(tail_params) > 1:
        d = args.ema_decay
        params_d = ckpt.ema_trees(tail_params, decay=d)
        install(params=params_d, model_state=base_state)
        trainer.reestimate_bn(trainset, passes=2)
        acc_d = trainer.evaluate(validset, info=False)
        state_d = jax.tree.map(np.asarray, trainer.state.model_state)
        record["candidates"]["ema+bn"] = {"valid_pct": round(acc_d * 100, 3),
                                          "decay": d, "snaps": len(tail_params)}
        print(f"[valid] ema(d={d}) + BN:    {acc_d*100:.3f}%", flush=True)

    # ---- select on valid, score the winner on test -------------------------
    options = {"best": (acc_a, base_params, base_state),
               "best+bn": (acc_b, base_params, state_b)}
    if params_c is not None:
        options["tailavg+bn"] = (acc_c, params_c, state_c)
    if params_d is not None:
        options["ema+bn"] = (acc_d, params_d, state_d)
    winner = max(options, key=lambda k: options[k][0])
    acc_w, params_w, state_w = options[winner]
    install(params=params_w, model_state=state_w)

    testset = data.load_test()
    top1, fps = test_top1(trainer, testset)
    record.update({
        "winner": winner, "winner_valid_pct": round(acc_w * 100, 3),
        "test_top1_pct": round(top1, 2), "test_throughput_img_s": round(fps, 1),
        "reference_pct": 74.39, "parity": bool(top1 >= 74.39),
        "checkpoint": best_ckpt_path,
        "hparams": {"lr": args.lr, "epochs": args.epochs, "batch": 256,
                    "optimizer": "sgd", "momentum": 0.9,
                    "weight_decay": args.wd, "dropout": args.dropout,
                    "scheduler": "cosine", "warmup": 5, "seed": args.seed,
                    "augment": ("crop+flip+affine" if args.affine else "crop+flip")
                    + (f"+cutout{args.cutout}" if args.cutout else "")
                    + (f"+mixup{args.mixup}" if args.mixup else ""),
                    "tail_avg": min(args.tail, len(tail_params)),
                    "snapshots": len(tail_params), "ema_decay": args.ema_decay,
                    "bn_reestimated": winner != "best"},
    })
    # persist the winning weights+stats as a checkpoint
    if winner != "best":
        win_path = best_ckpt_path.replace(".ckpt.npz", f"-{args.tag}-{winner}.ckpt.npz")
        trainer.save_checkpoint(path=win_path)
        record["checkpoint"] = win_path

    path = os.path.join(args.out,
                        f"RESULT-cinic-mobilenet_v1-standard-{args.tag}-s{args.seed}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"RESULT written to {path}", flush=True)


if __name__ == "__main__":
    main()
