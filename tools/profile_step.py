"""Per-op device-time profile for a training-step workload on the real chip.

The reference ships no profiler (SURVEY.md §5.1); this tool is the
round-4 instrument for the finetune-throughput question BASELINE.md
left open ("not yet per-op profiled"): the eval-suite `train_what=ft`
step measures 430 clips/s where the 3-forward-unit cost model predicts
~502 (= 753 * 2/3: 3 units over 32 clips vs pretrain's 4 units over 64).
It captures a `jax.profiler` trace around N steps
of the same program `bench.py --workload finetune` times (or the
pretrain step for a baseline), parses the Chrome-trace events, and
aggregates XLA op device time per step by HLO category.

Usage (real chip, ~2 min warm):
    python tools/profile_step.py --workload finetune
    python tools/profile_step.py --workload infonce

Output: one JSON line with per-category microseconds/step plus the
top-k individual ops, and a human table on stderr. The trace itself is
left under --logdir for TensorBoard/Perfetto.

Trace-parsing notes (axon relay, jax 0.9): device lanes are the trace
processes whose `process_name` metadata starts with "/device:TPU"; XLA
ops are complete events (ph == "X") on those lanes. Everything else
(host threads, the relay) is ignored. Steps are delimited by dividing
the summed device time by --steps — per-step attribution via
StepTraceAnnotation is not visible across the axon tunnel.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

import numpy as np


def _category(name: str) -> str:
    """HLO op name -> coarse category (fusion kinds kept separate)."""
    base = name.split("(")[0].strip()
    # strip trailing ".123" / digits
    m = re.match(r"^%?([A-Za-z][A-Za-z0-9_-]*?)[\.\d]*$", base)
    stem = m.group(1) if m else base
    stem = stem.lower()
    if "convolution" in stem or stem.startswith("conv"):
        return "convolution"
    if "fusion" in stem:
        return "fusion"
    if "all-reduce" in stem or "all-gather" in stem or "collective" in stem \
            or "reduce-scatter" in stem or "all-to-all" in stem:
        return "collective"
    if "copy" in stem or "transpose" in stem:
        return "copy/transpose"
    if "dot" in stem or "dynamic" in stem:
        return stem
    if "reduce" in stem:
        return "reduce"
    return stem


def parse_trace(logdir: str, steps: int, topk: int = 25):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    pid_names, tid_names = {}, {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = \
                ev.get("args", {}).get("name", "")

    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    if not device_pids:
        raise SystemExit(f"no device lane found; pids: {pid_names}")
    # a device pid carries overlapping rows (Steps / XLA Modules / XLA Ops)
    # that each cover the same device time — keep only the op-level row.
    # Prefix match tolerates renamed/suffixed lanes ("XLA Ops#1"); if no
    # op lane exists at all, summing every lane would silently triple-count
    # (Steps + Modules + Ops cover the same time), so that is a hard error.
    op_lanes = {k for k, n in tid_names.items()
                if k[0] in device_pids and n.startswith("XLA Ops")}
    if not op_lanes:
        lanes = {k: n for k, n in tid_names.items() if k[0] in device_pids}
        raise SystemExit(
            "no 'XLA Ops' device lane in trace (lanes: "
            f"{sorted(lanes.values())}); refusing to sum all lanes — that "
            "triple-counts device time (Steps/Modules/Ops overlap)")
    sys.stderr.write(f"device op lanes: "
                     f"{[(k, tid_names.get(k, '?')) for k in op_lanes]}\n")

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or \
                (ev.get("pid"), ev.get("tid")) not in op_lanes:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        if dur <= 0:
            continue
        name = ev.get("name", "?")
        per_op[name] += dur
        per_cat[_category(name)] += dur
        total += dur

    per_step = {k: v / steps for k, v in per_cat.items()}
    top_ops = sorted(per_op.items(), key=lambda kv: -kv[1])[:topk]
    return {
        "device_us_per_step": round(total / steps, 1),
        "categories_us_per_step": {k: round(v, 1) for k, v in
                                   sorted(per_step.items(),
                                          key=lambda kv: -kv[1])},
        "top_ops_us_per_step": [[n, round(v / steps, 1)] for n, v in top_ops],
        "trace_path": paths[-1],
    }


def _build_finetune(jax, batch_size: int, seq_len: int, img: int):
    """Same program as bench.py::bench_finetune (eval/main_classifier.py:
    308-364 hot loop)."""
    import jax.numpy as jnp

    from coclr_tpu.config import EvalConfig
    from coclr_tpu.evalsuite.driver import build_model, init_classifier_state
    from coclr_tpu.evalsuite.steps import make_classifier_steps

    cfg = EvalConfig(net="s3d", dataset="ucf101", seq_len=seq_len,
                     img_dim=img, batch_size=batch_size, train_what="ft",
                     optim="sgd", lr=1e-3, wd=1e-3, dropout=0.9,
                     compute_dtype="bfloat16")
    model = build_model(cfg)
    state = init_classifier_state(cfg, model)
    train_step, _, tx = make_classifier_steps(model, cfg, mesh=None)
    opt_state = jax.jit(tx.init)(state.params)
    rng = np.random.RandomState(0)
    batch = {
        "seq": jnp.asarray(rng.randint(0, 255,
                                       (batch_size, seq_len, img, img, 3),
                                       np.uint8)),
        "label": jnp.asarray(rng.randint(0, 101, (batch_size,))
                             .astype(np.int32)),
    }
    box = [state, opt_state, None]
    # pre-create keys + device-resident lr OUTSIDE the traced loop: a fresh
    # PRNGKey/scalar per step is a blocking host->device transfer (~RTT on
    # the axon tunnel) that would inflate wall_us_per_step vs bench.py
    keys = [jax.random.PRNGKey(i) for i in range(256)]
    lr = jnp.float32(1e-3)

    def run(i):
        box[0], box[1], box[2] = train_step(box[0], box[1], batch,
                                            keys[i % len(keys)], lr)

    def fence():
        assert np.isfinite(float(box[2]["loss"]))

    return run, fence, batch_size


def _build_pretrain(jax, variant: str, batch_size: int, seq_len: int,
                    img: int):
    """Same program as bench.py::bench_pretrain(variant)."""
    import jax.numpy as jnp

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.ops.augment import make_pretrain_preprocess
    from coclr_tpu.parallel import make_pretrain_step

    model = "infonce" if variant == "k400" else variant
    cfg = PretrainConfig(net="s3d", model=model, seq_len=seq_len,
                         img_dim=img, batch_size=batch_size,
                         moco_k=16384 if variant == "k400" else 2048,
                         compute_dtype="bfloat16", bn_shuffle="gather",
                         topk=5)
    encoder = ProjectionEncoder(network="s3d", dim=cfg.moco_dim,
                                dtype=cfg.dtype)
    sample = jnp.zeros((1, seq_len, img, img, 3), jnp.float32)
    state = moco.init_moco_state(jax.random.PRNGKey(0), encoder, model,
                                 sample, dim=cfg.moco_dim, K=cfg.moco_k)
    step_fn, tx = make_pretrain_step(
        encoder, cfg, mesh=None,
        preprocess_fn=make_pretrain_preprocess(cfg), donate=True)
    opt_state = jax.jit(tx.init)(state.params_q)
    rng = np.random.RandomState(0)
    batch = {
        "aug_base": jnp.asarray(rng.randint(0, 2, (batch_size, 2))
                                .astype(np.uint8)),
        "label": jnp.asarray(rng.randint(0, 101, (batch_size,))
                             .astype(np.int32)),
    }
    if variant == "coclr":
        for key in ("seq_rgb", "seq_flow"):
            batch[key] = jnp.asarray(rng.randint(
                0, 255, (batch_size, 2, seq_len, img, img, 3), np.uint8))
        batch["vname"] = jnp.asarray(
            rng.randint(0, 9999, (batch_size,)).astype(np.int32))
    else:
        batch["seq"] = jnp.asarray(rng.randint(
            0, 255, (batch_size, 2, seq_len, img, img, 3), np.uint8))
    box = [state, opt_state, None]
    # see _build_finetune: keys/lr pre-created outside the traced loop
    keys = [jax.random.PRNGKey(i) for i in range(256)]
    lr = jnp.float32(1e-3)

    def run(i):
        box[0], box[1], box[2] = step_fn(box[0], box[1], batch,
                                         keys[i % len(keys)], lr)

    def fence():
        assert np.isfinite(float(box[2]["loss"]))

    return run, fence, batch_size * 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="finetune",
                    choices=["finetune", "infonce", "coclr", "k400"])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--img_dim", type=int, default=128)
    ap.add_argument("--logdir", default="")
    ap.add_argument("--topk", type=int, default=25)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod
    jax = benchmod._setup_jax()

    if args.workload == "finetune":
        run, fence, clips = _build_finetune(jax, args.batch_size,
                                            args.seq_len, args.img_dim)
    else:
        run, fence, clips = _build_pretrain(jax, args.workload,
                                            args.batch_size,
                                            args.seq_len, args.img_dim)

    # warm: compile + first-execution effects out of the trace
    for i in range(3):
        run(i)
    fence()

    logdir = args.logdir or tempfile.mkdtemp(prefix="coclr_prof_")
    from coclr_tpu.utils.profiling import device_trace
    import time
    t0 = time.perf_counter()
    with device_trace(logdir):
        for i in range(args.steps):
            run(100 + i)
        fence()
    wall = time.perf_counter() - t0

    out = parse_trace(logdir, args.steps, args.topk)
    out.update({
        "workload": args.workload,
        "steps": args.steps,
        "clips_per_step": clips,
        "wall_us_per_step": round(wall * 1e6 / args.steps, 1),
        "clips_per_sec_device": round(
            clips / (out["device_us_per_step"] * 1e-6), 1)
        if out["device_us_per_step"] else None,
    })
    for k, v in out["categories_us_per_step"].items():
        sys.stderr.write(f"{k:>28s}  {v:>10.1f} us/step\n")
    sys.stderr.write(f"{'TOTAL device':>28s}  "
                     f"{out['device_us_per_step']:>10.1f} us/step "
                     f"(wall {out['wall_us_per_step']:.1f})\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
