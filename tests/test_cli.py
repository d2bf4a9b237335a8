"""CLI smoke: the actual main_nce.py entry point via subprocess (argparse ->
config -> training), on the CPU mesh with synthetic data. The e2e tests call
run_pretrain directly; this covers the flag wiring and the default dataset
path resolution (data_root + process_data metadata)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    from coclr_tpu.data.synthetic import make_synthetic_ucf

    root = tmp_path_factory.mktemp("cli_root")
    out = make_synthetic_ucf(str(root / "work"), n_classes=2, n_groups=3,
                             n_clips=2, n_frames=12, size=(48, 64),
                             flow=False)
    (root / "UCF101").mkdir()
    os.replace(out["db_path"], root / "UCF101" / "ucf101_frame.lmdb")
    return {"data_root": str(root), "meta": out["root"]}


def test_main_nce_cli(staged, tmp_path):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO)
    # metadata root default resolves to <repo>/process_data/data/ucf101 —
    # point it at the synthetic meta dir like a user would
    link = os.path.join(REPO, "process_data", "data", "ucf101")
    os.makedirs(os.path.dirname(link), exist_ok=True)
    # the link is a GLOBAL contract (see CLAUDE.md): a concurrent long drive
    # resolves its split metadata through it, so save and RESTORE any
    # existing target rather than leaving it deleted
    prior = os.readlink(link) if os.path.islink(link) else None
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    os.symlink(staged["meta"], link)
    try:
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "main_nce.py"),
             "--dataset", "ucf101-2clip", "--net", "tiny", "--model",
             "infonce", "--seq_len", "4", "--img_dim", "32", "--batch_size",
             "1", "--moco-k", "16", "--moco-dim", "16", "--epochs", "1",
             "--print_freq", "1", "-j", "2", "--compute_dtype", "float32",
             "--data_root", staged["data_root"], "--prefix", "clitest"],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=900)
    finally:
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(link)
        if prior is not None and not os.path.exists(link):
            os.symlink(prior, link)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Training from ep 0 to ep 1 finished" in res.stdout, \
        res.stdout[-2000:]
    assert "creating infonce model" in res.stdout


def test_env_platform_is_authoritative():
    """JAX_PLATFORMS=cpu in the env must actually select CPU once coclr_tpu
    is imported (coclr_tpu/__init__.py): the axon dev image's site hook
    registers a TPU plugin that otherwise wins over the env var, silently
    landing every documented CPU subprocess recipe on the real chip."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import coclr_tpu, jax; print(jax.default_backend())"],
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


def test_preemption_checkpoint_and_resume(staged, tmp_path):
    """SIGTERM mid-training -> finish the in-flight step, write
    preempt.ckpt, exit 0; --resume from it completes the run (additive
    subsystem; the reference loses the partial epoch and has no handler,
    SURVEY §5.3)."""
    import signal
    import time as _time

    mr = tmp_path / "mr"
    mr.mkdir()
    os.symlink(staged["meta"], mr / "ucf101")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO, COCLR_META_ROOT=str(mr))
    args = [sys.executable, "-u", os.path.join(REPO, "main_nce.py"),
            "--dataset", "ucf101-2clip", "--net", "tiny", "--model",
            "infonce", "--seq_len", "4", "--img_dim", "32", "--batch_size",
            "1", "--moco-k", "16", "--moco-dim", "16", "--print_freq", "1",
            "-j", "2", "--compute_dtype", "float32",
            "--data_root", staged["data_root"], "--prefix", "preempt"]
    p = subprocess.Popen(args + ["--epochs", "50"], cwd=str(tmp_path),
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    out = []
    try:
        deadline = _time.time() + 600
        for line in p.stdout:
            out.append(line)
            if line.startswith("Epoch:[0]"):  # at least one step ran
                p.send_signal(signal.SIGTERM)
                break
            assert _time.time() < deadline, "".join(out)[-2000:]
        out.append(p.stdout.read())
        rc = p.wait(timeout=600)
    finally:
        if p.poll() is None:
            p.kill()
    text = "".join(out)
    assert rc == 0, text[-2000:]
    assert "preemption checkpoint written" in text, text[-2000:]
    cks = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
           for f in fs if f == "preempt.ckpt"]
    assert len(cks) == 1, text[-2000:]

    res = subprocess.run(args + ["--epochs", "1", "--resume", cks[0]],
                         cwd=str(tmp_path), env=env, capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "=> resumed" in res.stdout, res.stdout[-2000:]
    assert "finished" in res.stdout, res.stdout[-2000:]
