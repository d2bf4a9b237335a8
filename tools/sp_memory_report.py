"""Per-device memory scaling evidence for temporal/spatial sequence parallelism.

Compiles the PRODUCTION pretrain step (make_pretrain_step, donated state)
for the same global workload on a (data=N) mesh vs a (data=N, sp=S) mesh
and prints XLA's compiled per-device memory stats (temp = activations +
workspace, the number that 1/sp is supposed to shrink; argument/output =
replicated state + batch shards). Runs on the virtual CPU mesh — the
sharding, and therefore the per-device buffer assignment, is exactly what
a real TPU mesh of the same shape would get; only the backend codegen
differs.

Usage:
  python tools/sp_memory_report.py [--net s3d] [--seq_len 32]
      [--img_dim 64] [--batch_size 2] [--sp 2] [--sph 2]
(--sph > 1 adds (data, sph) and (data, sp, sph) rows — spatial sequence
parallelism sharding the clip height axis, round 4.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="s3d")
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--img_dim", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--sph", type=int, default=0,
                    help=">1: add spatial-sp rows (H sharded over sph)")
    ap.add_argument("--data", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=%d"
        % (args.data * args.sp * max(1, args.sph)))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.parallel import make_mesh, make_pretrain_step
    from coclr_tpu.parallel.mesh import sp_axis_of

    T, S = args.seq_len, args.img_dim
    gb = args.data * args.batch_size  # same global batch in both runs

    rows = []
    combos = [(1, 1), (args.sp, 1)]
    if args.sph and args.sph > 1:
        combos += [(1, args.sph), (args.sp, args.sph)]
    for sp_size, sph_size in combos:
        n_dev = args.data * sp_size * sph_size
        cfg = PretrainConfig(net=args.net, model="infonce", seq_len=T,
                             img_dim=S, batch_size=args.batch_size,
                             moco_k=gb * 8, moco_dim=128,
                             compute_dtype="bfloat16", sp_size=sp_size,
                             sph_size=sph_size)
        mesh = make_mesh(n_dev, sp_size=sp_size, sph_size=sph_size)
        enc = ProjectionEncoder(network=cfg.net, dim=cfg.moco_dim,
                                dtype=cfg.dtype, sp_axis=sp_axis_of(mesh))
        sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
        state = moco.init_moco_state(jax.random.PRNGKey(0), enc, cfg.model,
                                     sample, dim=cfg.moco_dim, K=cfg.moco_k)
        step, tx = make_pretrain_step(enc, cfg, mesh=mesh, donate=True)
        opt = jax.jit(tx.init)(state.params_q)
        batch = {"seq": jnp.zeros((gb, 2, T, S, S, 3), jnp.float32)}

        # both the plain jit and the lazy per-structure builder expose
        # .lower() (parallel/mesh.lazy_shard_jit) — AOT compile, no exec
        lowered = step.lower(state, opt, batch, jax.random.PRNGKey(1),
                             jnp.float32(1e-3))
        stats = lowered.compile().memory_analysis()
        rows.append((sp_size, sph_size, n_dev, stats))

    print(f"\nworkload: {args.net} InfoNCE step, global batch {gb} x 2 "
          f"clips, T={T}, {S}x{S}, bf16 compute; data={args.data}")
    print("| mesh | per-device temp (activations) | arguments | output |")
    print("|---|---|---|---|")
    base_temp = None
    for sp_size, sph_size, n_dev, st in rows:
        name = f"(data={args.data}"
        if sp_size > 1:
            name += f", sp={sp_size}"
        if sph_size > 1:
            name += f", sph={sph_size}"
        name += ")"
        t, a, o = (st.temp_size_in_bytes, st.argument_size_in_bytes,
                   st.output_size_in_bytes)
        if base_temp is None:
            base_temp = t
            rel = ""
        else:
            rel = f" ({t / base_temp:.2f}x of unsharded)"
        print(f"| {name} | {t / 2**20:.1f} MiB{rel} | {a / 2**20:.1f} MiB "
              f"| {o / 2**20:.1f} MiB |")


if __name__ == "__main__":
    main()
