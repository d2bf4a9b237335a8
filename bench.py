"""Benchmark: clips/sec/chip for the S3D InfoNCE pretrain step.

The reference's defining workload (BASELINE.md): S3D, seq_len 32, per-device
batch 32 (= 64 clips/step), moco-k 2048, 128x128 crops, Adam — the full
fused step including on-device augmentation, EMA, shuffle-BN path, logits,
backward, optimizer and queue update.

Prints ONE JSON line. `vs_baseline` is measured against an estimated
55 clips/sec/chip for the reference PyTorch stack on one V100 (the 2-GPU DDP
config in README.md:28-32; no published throughput exists — see BASELINE.md —
so this is a documented engineering estimate: S3D fwd+bwd ~= 3 x 39 GFLOP x
64 clips at ~35% V100 fp32 utilization plus dataloader overhead).
"""

import json
import time

import numpy as np

REFERENCE_CLIPS_PER_SEC_PER_GPU = 55.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the fused step is a ~10-minute first
    # compile on the axon remote compiler; repeat runs are seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.ops.augment import make_pretrain_preprocess
    from coclr_tpu.parallel import make_pretrain_step

    n_dev = len(jax.devices())
    T, S = 32, 128

    def build(batch_size):
        cfg = PretrainConfig(net="s3d", model="infonce", seq_len=T,
                             img_dim=S, batch_size=batch_size, moco_k=2048,
                             compute_dtype="bfloat16", bn_shuffle="gather")
        encoder = ProjectionEncoder(network="s3d", dim=cfg.moco_dim,
                                    dtype=cfg.dtype)
        sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
        state = moco.init_moco_state(jax.random.PRNGKey(0), encoder,
                                     "infonce", sample, dim=cfg.moco_dim,
                                     K=cfg.moco_k)
        step_fn, tx = make_pretrain_step(encoder, cfg, mesh=None,
                                         preprocess_fn=make_pretrain_preprocess(cfg),
                                         donate=True)
        opt_state = jax.jit(tx.init)(state.params_q)
        rng = np.random.RandomState(0)
        # device-resident batch: this bench measures the training step
        # (aug+fwd+bwd+opt+queue). Host->device feeding overlaps with the
        # step in the real loader; on this axon dev tunnel H2D is ~35MB/s
        # (a tunnel artifact, not representative of a TPU host's DMA).
        batch = {
            "seq": jnp.asarray(
                rng.randint(0, 255, (batch_size, 2, T, S, S, 3), np.uint8)),
            "aug_base": jnp.asarray(rng.randint(0, 2, (batch_size, 2))
                                    .astype(np.uint8)),
            "label": jnp.asarray(rng.randint(0, 101, (batch_size,))
                                 .astype(np.int32)),
        }
        return cfg, step_fn, state, opt_state, batch

    batch_size = 32
    while batch_size >= 4:
        try:
            cfg, step_fn, state, opt_state, batch = build(batch_size)
            # warmup / compile; end with a VALUE fetch — on tunneled
            # backends block_until_ready returns before the stream drains,
            # which would push compile/queue time into the timed region
            for i in range(3):
                state, opt_state, metrics = step_fn(
                    state, opt_state, batch, jax.random.PRNGKey(i),
                    jnp.float32(1e-3))
            assert np.isfinite(float(metrics["loss"]))
            break
        except Exception as e:  # OOM fallback
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                batch_size //= 2
                continue
            raise
    else:
        raise RuntimeError("could not fit any batch size")

    # median of 3 timing windows: single-window run-to-run spread on the
    # axon tunnel measured ~1.3%; the median tightens that without
    # changing what is measured
    windows = []
    for w in range(3):
        n_steps = 15
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, opt_state, metrics = step_fn(
                state, opt_state, batch,
                jax.random.PRNGKey(100 + 50 * w + i), jnp.float32(1e-3))
        # device->host value fetch: on tunneled backends block_until_ready
        # alone can return before the execution stream drains
        assert np.isfinite(float(metrics["loss"]))
        windows.append((time.perf_counter() - t0) / n_steps)
    dt = float(np.median(windows))

    clips_per_sec_per_chip = (batch_size * 2) / dt  # 2 clips per sample
    print(json.dumps({
        "metric": "clips/sec/chip, S3D InfoNCE pretrain step (seq_len 32, "
                  f"batch {batch_size}, moco-k 2048, incl. on-device aug)",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec_per_chip /
                             REFERENCE_CLIPS_PER_SEC_PER_GPU, 3),
    }))


if __name__ == "__main__":
    main()
