"""Multi-PROCESS (multi-host) dryrun — r3 VERDICT next-step #7.

Simulates a 2-host × 4-devices-per-host DP slice on CPU: two worker
processes bring up jax.distributed (parallel.mesh.init_distributed), build
the global 8-device mesh, and run ONE full sharded train step where each
process feeds its own disjoint DataLoader shard
(DataLoader(host_id, num_hosts)) assembled into global arrays with
jax.make_array_from_process_local_data. The gradient psum crosses the
process boundary through the distributed CPU runtime — the DCN analogue
of the single-process dryrun's ICI collectives.

Writes data/output/multihost_dryrun.json (process_count=2) — the
MULTICHIP-style artifact for the multi-host path.

Usage: python scripts/dryrun_multihost.py [--procs 2] [--local-devices 4]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(proc_id: int, n_procs: int, local_devices: int, port: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from convnets_tpu.parallel.mesh import (
        data_sharding, init_distributed, make_mesh, replicated,
    )

    pi, pc, ld = init_distributed(f"localhost:{port}", n_procs, proc_id)
    assert (pi, pc, ld) == (proc_id, n_procs, local_devices), (pi, pc, ld)

    import jax.numpy as jnp
    import numpy as np

    from convnets_tpu.data import synthetic_dataset
    from convnets_tpu.data.loader import DataLoader
    from convnets_tpu.models import build_model
    from convnets_tpu.settings import Settings
    from convnets_tpu.train.engine import Trainer

    mesh = make_mesh()  # global: n_procs * local_devices
    assert mesh.size == n_procs * local_devices

    global_batch = 4 * mesh.size
    per_host = global_batch // pc
    setting = Settings(kind="18", input_size=(3, 32, 32), num_classes=10,
                       batch_size=global_batch, mixed_precision=True,
                       data_augment=True, data_norm=True)
    model = build_model("resnet", setting)
    trainer = Trainer(model, mesh=mesh)
    trainer.init_state()

    # each host iterates its disjoint shard of the (synthetic) split;
    # per-host batches assemble into global sharded arrays
    ds = synthetic_dataset(4 * global_batch, (32, 32, 3), 10, seed=0)
    loader = DataLoader(ds, per_host, shuffle=True, seed=0,
                        host_id=pi, num_hosts=pc)
    x_l, y_l, w_l = next(iter(loader))

    data_s = data_sharding(mesh)
    glob = lambda local, extra_shape: jax.make_array_from_process_local_data(
        data_s, np.asarray(local), (global_batch, *extra_shape))
    x = glob(x_l, x_l.shape[1:])
    y = glob(np.asarray(y_l, np.int32), ())
    w = glob(w_l, ())

    step_fn = trainer._get_train_step(augment=True, norm=True)
    state, loss, correct = step_fn(trainer.state, x, y, w, jax.random.key(0))
    jax.block_until_ready(state.params)
    loss = float(loss)
    print(f"[proc {pi}/{pc}] one sharded step over {mesh.size} devices "
          f"({pc} processes): loss={loss:.4f}", flush=True)

    # --- scanned epoch (DeviceCacheLoader, r4 VERDICT #7): the resident
    # split replicates across processes; each host contributes its disjoint
    # per-host index shard as its block of the global batch axis ---------
    from convnets_tpu.data.loader import DeviceCacheLoader

    trainer.state = state
    dcl = DeviceCacheLoader(ds, per_host, shuffle=True, seed=0,
                            drop_last=True, host_id=pi, num_hosts=pc)
    scan_loss, scan_score = trainer._run_train_epoch(dcl, 0)
    print(f"[proc {pi}/{pc}] scanned epoch over the {pc}-process mesh: "
          f"loss={scan_loss:.4f} score={scan_score:.4f}", flush=True)

    # --- chunked epoch (ShardRotationLoader): per-host disjoint chunks,
    # split row-sharded over 'data', chunk_bytes forced tiny so the epoch
    # actually rotates several chunks through the (virtual) HBM ----------
    from convnets_tpu.data.stream import ShardRotationLoader

    img_bytes = int(np.prod(ds.image_shape))
    srl = ShardRotationLoader(ds, per_host, shuffle=True, seed=1,
                              drop_last=True, host_id=pi, num_hosts=pc,
                              chunk_bytes=2 * per_host * img_bytes)
    nchunks = srl.num_chunks
    chunk_loss, chunk_score = trainer._run_chunked_train_epoch(
        srl, 0, augment=True, norm=True)
    print(f"[proc {pi}/{pc}] chunked epoch ({nchunks} chunks, row-sharded "
          f"split): loss={chunk_loss:.4f} score={chunk_score:.4f}", flush=True)

    if pi == 0:
        out = {
            "ok": True,
            "process_count": pc,
            "local_devices": ld,
            "mesh_devices": mesh.size,
            "global_batch": global_batch,
            "per_host_batch": per_host,
            "loss": loss,
            "paths": {
                "per_step": {"ok": True, "loss": loss},
                "scanned_epoch": {"ok": True, "loss": scan_loss,
                                  "score": scan_score},
                "chunked_epoch": {"ok": True, "loss": chunk_loss,
                                  "score": chunk_score,
                                  "num_chunks": nchunks},
            },
            "collectives": "grad psum + sync-BN over the 2-process mesh "
                           "(distributed CPU runtime = DCN analogue); "
                           "chunked path adds the row-sharded split "
                           "gather collectives",
        }
        os.makedirs(os.path.join(REPO, "data/output"), exist_ok=True)
        with open(os.path.join(REPO, "data/output/multihost_dryrun.json"),
                  "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--port", type=int, default=29531)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.local_devices, args.port)
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the TPU-chip claim
    import re

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    procs = []
    for i in range(args.procs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(args.procs),
             "--local-devices", str(args.local_devices),
             "--port", str(args.port), "--worker", str(i)],
            env=env, cwd=REPO))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker rcs: {rc}")
    print("multihost dryrun OK")


if __name__ == "__main__":
    main()
