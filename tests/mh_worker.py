"""Subprocess entry for tests/test_multihost.py: one host of a 2-process
JAX distributed run driving the FULL pretrain loop (run_pretrain) over a
shared synthetic dataset. The parent test compares the resulting state
against a single-process run of the identical global workload.

Mirrors what one host of a TPU pod executes: `jax.distributed.initialize`
via the explicit coordinator triple (CPU backend -> Gloo collectives),
process-sharded Loader, global-array batch assembly, primary-only
checkpoint/log writes (parallel/multihost.py).
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--root", required=True)
    ap.add_argument("--db_path", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max_steps", type=int, default=3)
    ap.add_argument("--ckpt_format", default="flax")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                               % args.local_devices)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")  # beat the site axon pin
    # distributed init must precede ANY backend-initialising jax call —
    # the coclr_tpu import chain below makes some, so initialize directly
    # here (even importing parallel.multihost would pull the package
    # __init__ -> ops). run_pretrain's maybe_initialize tolerates this:
    # jax.distributed.initialize raises on double-init, which it catches
    # as already-initialized.
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    os.chdir(args.workdir)

    import numpy as np

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.data.datasets import UCF101LMDB_2CLIP
    from coclr_tpu.train.pretrain import run_pretrain

    cfg = PretrainConfig(
        net="tiny", model="infonce", dataset="ucf101-2clip",
        seq_len=4, img_dim=32, batch_size=1, moco_k=32, moco_dim=16,
        epochs=1, workers=2, compute_dtype="float32", schedule=(100,),
        print_freq=1, decode_size=(48, 64),
        coordinator=args.coordinator, num_processes=args.num_processes,
        process_id=args.process_id, ckpt_format=args.ckpt_format)
    ds = UCF101LMDB_2CLIP(root=args.root, db_path=args.db_path, mode="train",
                          num_frames=cfg.seq_len, ds=cfg.ds,
                          return_label=True, img_dim=cfg.img_dim,
                          seed=cfg.seed)
    state, _opt, info = run_pretrain(cfg, dataset=ds,
                                     max_steps=args.max_steps)

    summary = {
        "process": args.process_id,
        "n_global_devices": jax.device_count(),
        "train_acc": float(info["train_acc"]),
        "param_l1": float(sum(
            np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
            for x in jax.tree.leaves(state.params_q))),
        "queue_l1": float(np.abs(
            np.asarray(jax.device_get(state.queue), np.float64)).sum()),
        "queue_ptr": int(np.asarray(jax.device_get(state.queue_ptr))),
        "exp_path": info["exp_path"],
    }
    with open(args.out, "w") as f:
        json.dump(summary, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
