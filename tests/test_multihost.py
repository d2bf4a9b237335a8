"""Multi-host execution (one JAX process per host, parallel/multihost.py).

The reference's analogue is torch.distributed NCCL DDP with one rank per
GPU (/root/reference/main_nce.py:138-151). Here: the Loader's per-process
block sharding is pinned against the unsharded loader, and the FULL
pretrain driver is run as a real 2-process jax.distributed job (CPU
backend, Gloo collectives) and compared against the identical global
workload on a single process — params, queue, queue pointer.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from coclr_tpu.data.loader import Loader, collate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _IdxDataset:
    """sample i -> {"x": [i, i, i], "label": i}; enough to trace order."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.int64),
                "label": np.int64(i)}


def test_loader_process_shard_blocks():
    """Two rank loaders' batches, concatenated in rank order, equal the
    unsharded loader's batches element-for-element — the property the
    process-major mesh + make_array_from_process_local_data assembly
    relies on."""
    ds = _IdxDataset(22)
    full = Loader(ds, batch_size=4, num_workers=1, seed=3)
    shards = [Loader(ds, batch_size=4, num_workers=1, seed=3,
                     process_shard=(r, 2)) for r in range(2)]
    full.set_epoch(1)
    for loader in shards:
        loader.set_epoch(1)
    got = [list(loader) for loader in shards]
    want = list(full)
    assert len(want) == 5 and len(got[0]) == 5 and len(got[1]) == 5
    for b_full, b0, b1 in zip(want, got[0], got[1]):
        for key in b_full:
            np.testing.assert_array_equal(
                b_full[key], np.concatenate([b0[key], b1[key]]))


def test_loader_process_shard_validation():
    ds = _IdxDataset(8)
    with pytest.raises(ValueError, match="divisible"):
        Loader(ds, batch_size=3, process_shard=(0, 2))
    with pytest.raises(ValueError, match="rank"):
        Loader(ds, batch_size=4, process_shard=(2, 2))
    with pytest.raises(ValueError, match="drop_last"):
        Loader(ds, batch_size=4, process_shard=(0, 2), drop_last=False)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from coclr_tpu.data.synthetic import make_synthetic_ucf
    root = tmp_path_factory.mktemp("synth_mh")
    return make_synthetic_ucf(str(root), n_classes=2, n_groups=5, n_clips=2,
                              n_frames=20, size=(48, 64))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_cli_smoke(synth, tmp_path):
    """The DOCUMENTED multihost entry point: `main_nce.py --coordinator ...
    --num_processes 2 --process_id r` as two real subprocesses.

    ADVICE-r3 high: the CLIs used to import the training stack at module
    top, whose import chain initialized the XLA backend before
    jax.distributed.initialize could run — the flags crashed at startup and
    only tests/mh_worker.py (which initializes first by hand) masked it.
    This pins the CLI path itself: early init in __main__ plus a
    backend-clean import chain."""
    port = _free_port()
    mr = tmp_path / "mr"
    mr.mkdir()
    os.symlink(synth["root"], mr / "ucf101")
    data_root = tmp_path / "data"
    (data_root / "UCF101").mkdir(parents=True)
    os.link(synth["db_path"], data_root / "UCF101" / "ucf101_frame.lmdb")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""),
               COCLR_META_ROOT=str(mr))
    args = [sys.executable, "-u", os.path.join(REPO, "main_nce.py"),
            "--dataset", "ucf101-2clip", "--net", "tiny", "--model",
            "infonce", "--seq_len", "4", "--img_dim", "32", "--batch_size",
            "1", "--moco-k", "16", "--moco-dim", "16", "--epochs", "1",
            "--print_freq", "1", "-j", "1", "--compute_dtype", "float32",
            "--data_root", str(data_root), "--prefix", "mhcli",
            "--coordinator", f"127.0.0.1:{port}", "--num_processes", "2"]
    procs = [subprocess.Popen(args + ["--process_id", str(r)],
                              cwd=str(tmp_path), env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for r in range(2)]
    logs = [p.communicate(timeout=900)[0].decode(errors="replace")
            for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r}:\n{logs[r][-4000:]}"
    assert "multihost: process 0/2" in logs[0], logs[0][-2000:]
    assert "finished" in logs[0], logs[0][-2000:]
    # non-primary stdout is suppressed (reference rank-0-only printing)
    assert "finished" not in logs[1], logs[1][-2000:]


_BCAST_WORKER = """
import sys
import numpy as np
import jax
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from coclr_tpu.parallel import multihost
r = jax.process_index()
# divergent host-local trees: rank r's bytes everywhere
tree = {"w": np.full((3,), float(r), np.float32), "n": r, "f": float(r)}
out = multihost.broadcast_from_primary(tree)
assert float(np.asarray(out["w"]).sum()) == 0.0, out
assert int(out["n"]) == 0 and float(out["f"]) == 0.0, out
# preemption agreement: a flag on rank 0 only must be seen by BOTH
assert multihost.agree_flag(r == 0) is True
assert multihost.agree_flag(False) is False
print("BCAST_OK", flush=True)
"""


def test_broadcast_and_agree_two_process(tmp_path):
    """broadcast_from_primary replaces every host's state with process 0's
    (the divergence guard behind primary-only checkpoint restore,
    ADVICE-r3 medium) and agree_flag ORs the preemption flag across hosts
    (ADVICE-r3 low) — pinned with genuinely divergent 2-process inputs."""
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    procs = [subprocess.Popen(
        [sys.executable, "-c", _BCAST_WORKER, f"127.0.0.1:{port}", str(r)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    logs = [p.communicate(timeout=300)[0].decode(errors="replace")
            for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r}:\n{logs[r][-3000:]}"
        assert "BCAST_OK" in logs[r]


def test_two_process_full_driver_equivalence(synth, tmp_path, monkeypatch):
    """run_pretrain as a genuine 2-process distributed job (2 local CPU
    devices each -> 4 global) == the same global workload single-process
    (data=4 mesh): final params/queue to f32 tolerance, queue_ptr exact.
    Also pins primary-only checkpointing."""
    port = _free_port()
    mh_dir = tmp_path / "mh"
    mh_dir.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    worker = os.path.join(REPO, "tests", "mh_worker.py")
    outs = [str(tmp_path / f"out{r}.json") for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process_id", str(r),
             "--num_processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--root", synth["root"], "--db_path", synth["db_path"],
             "--workdir", str(mh_dir), "--out", outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    logs = [p.communicate(timeout=900)[0].decode(errors="replace")
            for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"worker {r} failed:\n{logs[r][-4000:]}"
    res = [json.load(open(o)) for o in outs]
    assert res[0]["n_global_devices"] == 4
    # both hosts hold identical replicated state
    assert res[0]["queue_ptr"] == res[1]["queue_ptr"]
    np.testing.assert_allclose(res[0]["param_l1"], res[1]["param_l1"],
                               rtol=1e-6)

    # primary-only writes: host 0's exp tree has the checkpoint, and it is
    # the only one (both workers shared one workdir)
    import glob
    ckpts = glob.glob(str(mh_dir / "log-pretrain" / "**" / "epoch*.ckpt"),
                      recursive=True)
    assert len(ckpts) == 1, ckpts

    # single-process reference: identical global workload on a data=4 mesh
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    monkeypatch.chdir(single_dir)
    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.data.datasets import UCF101LMDB_2CLIP
    from coclr_tpu.train.pretrain import run_pretrain
    cfg = PretrainConfig(
        net="tiny", model="infonce", dataset="ucf101-2clip",
        seq_len=4, img_dim=32, batch_size=1, moco_k=32, moco_dim=16,
        epochs=1, workers=2, compute_dtype="float32", schedule=(100,),
        print_freq=1, decode_size=(48, 64), num_devices=4)
    ds = UCF101LMDB_2CLIP(root=synth["root"], db_path=synth["db_path"],
                          mode="train", num_frames=cfg.seq_len, ds=cfg.ds,
                          return_label=True, img_dim=cfg.img_dim,
                          seed=cfg.seed)
    state, _opt, _info = run_pretrain(cfg, dataset=ds, max_steps=3)
    import jax
    param_l1 = float(sum(
        np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
        for x in jax.tree.leaves(state.params_q)))
    queue_l1 = float(np.abs(
        np.asarray(jax.device_get(state.queue), np.float64)).sum())
    assert int(np.asarray(jax.device_get(state.queue_ptr))) \
        == res[0]["queue_ptr"]
    # Gloo cross-process reductions may order float adds differently than
    # the single-process XLA:CPU collectives — tolerance, not bitwise
    np.testing.assert_allclose(res[0]["param_l1"], param_l1, rtol=2e-5)
    np.testing.assert_allclose(res[0]["queue_l1"], queue_l1, rtol=2e-5)


def test_multihost_orbax_cross_mesh_resume(synth, tmp_path, monkeypatch):
    """Composition flow (VERDICT-r3 ask #3): a 2-process multihost job
    CHECKPOINTS IN ORBAX FORMAT (primary-only), then a SINGLE-process run
    on a different mesh (1 proc x 4 devices vs 2 x 2) resumes from that
    directory. Caught a real bug: orbax's default Checkpointer runs
    all-process sync_global_devices barriers inside save, so host 0's
    primary-only save collided with host 1's next training collective
    ('sync_global_devices name mismatch') — --multihost --ckpt_format
    orbax crashed at the first epoch boundary until _std_checkpointer
    scoped orbax to the calling process (utils/checkpoint.py)."""
    port = _free_port()
    mh_dir = tmp_path / "mh_orbax"
    mh_dir.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "mh_worker.py")
    outs = [str(tmp_path / f"oout{r}.json") for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process_id", str(r),
             "--num_processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--root", synth["root"], "--db_path", synth["db_path"],
             "--workdir", str(mh_dir), "--out", outs[r],
             "--ckpt_format", "orbax"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    logs = [p.communicate(timeout=900)[0].decode(errors="replace")
            for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"worker {r} failed:\n{logs[r][-4000:]}"
    res = [json.load(open(o)) for o in outs]

    import glob

    from coclr_tpu.utils.checkpoint import is_orbax_checkpoint
    cks = glob.glob(str(mh_dir / "log-pretrain" / "**" / "epoch0.ckpt"),
                    recursive=True)
    assert len(cks) == 1 and is_orbax_checkpoint(cks[0]), cks

    # resume the orbax checkpoint single-process on a data=4 mesh: the
    # restored replicated state must carry the multihost job's exact values
    single_dir = tmp_path / "single_orbax"
    single_dir.mkdir()
    monkeypatch.chdir(single_dir)
    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.data.datasets import UCF101LMDB_2CLIP
    from coclr_tpu.train.pretrain import run_pretrain
    cfg = PretrainConfig(
        net="tiny", model="infonce", dataset="ucf101-2clip",
        seq_len=4, img_dim=32, batch_size=1, moco_k=32, moco_dim=16,
        epochs=1, workers=2, compute_dtype="float32", schedule=(100,),
        print_freq=1, decode_size=(48, 64), num_devices=4,
        ckpt_format="orbax", resume=cks[0])
    ds = UCF101LMDB_2CLIP(root=synth["root"], db_path=synth["db_path"],
                          mode="train", num_frames=cfg.seq_len, ds=cfg.ds,
                          return_label=True, img_dim=cfg.img_dim,
                          seed=cfg.seed)
    # epoch0 was the final epoch: resume returns the restored state untouched
    state, _opt, _info = run_pretrain(cfg, dataset=ds)
    import jax
    param_l1 = float(sum(
        np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
        for x in jax.tree.leaves(state.params_q)))
    queue_l1 = float(np.abs(
        np.asarray(jax.device_get(state.queue), np.float64)).sum())
    assert int(np.asarray(jax.device_get(state.queue_ptr))) \
        == res[0]["queue_ptr"]
    np.testing.assert_allclose(param_l1, res[0]["param_l1"], rtol=1e-6)
    np.testing.assert_allclose(queue_l1, res[0]["queue_l1"], rtol=1e-6)
