"""End-to-end integration: the minimum slice (SURVEY.md §7) on synthetic data.

config -> LMDB data -> loader -> on-device aug -> encoder -> queue/EMA ->
loss -> optimizer -> checkpoint -> resume, plus the CoCLR two-checkpoint
cycle, on the 8-virtual-device CPU mesh.
"""

import glob
import os

import numpy as np
import pytest

from coclr_tpu.config import PretrainConfig
from coclr_tpu.data.datasets import (UCF101LMDB_2CLIP,
                                     UCF101_2STREAM_LMDB_2CLIP)
from coclr_tpu.data.synthetic import make_synthetic_ucf
from coclr_tpu.train.pretrain import run_pretrain


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_e2e")
    # 2 classes x 5 groups x 2 clips = 20 videos; groups 1-4 train (16)
    return make_synthetic_ucf(str(root), n_classes=2, n_groups=5, n_clips=2,
                              n_frames=20, size=(48, 64))


def tiny_cfg(**kw):
    base = dict(net="tiny", model="infonce", dataset="ucf101-2clip",
                seq_len=4, img_dim=32, batch_size=1, moco_k=32, moco_dim=16,
                epochs=1, workers=2, compute_dtype="float32",
                schedule=(100,), print_freq=1, decode_size=(48, 64))
    base.update(kw)
    return PretrainConfig(**base)


def _dataset(synth, cfg):
    return UCF101LMDB_2CLIP(root=synth["root"], db_path=synth["db_path"],
                            mode="train", num_frames=cfg.seq_len, ds=cfg.ds,
                            return_label=True, img_dim=cfg.img_dim,
                            seed=cfg.seed)


def test_infonce_e2e_and_resume(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(epochs=1)
    ds = _dataset(synth, cfg)
    state, opt_state, info = run_pretrain(cfg, dataset=ds, max_steps=2)
    assert np.isfinite(info["train_acc"])
    ckpts = glob.glob(os.path.join(info["exp_path"], "model", "epoch*.ckpt"))
    assert len(ckpts) == 1

    # resume continues from epoch+1
    cfg2 = tiny_cfg(epochs=2, resume=ckpts[0])
    state2, _, info2 = run_pretrain(cfg2, dataset=ds, max_steps=2)
    assert int(np.asarray(state2.step)) > int(np.asarray(state.step))


def test_infonce_e2e_orbax_ckpt(synth, tmp_path, monkeypatch):
    """--ckpt_format orbax through the real train loop: epoch save is an
    orbax directory and --resume restores from it (auto-detected)."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(epochs=1, ckpt_format="orbax")
    ds = _dataset(synth, cfg)
    state, _, info = run_pretrain(cfg, dataset=ds, max_steps=2)
    ckpts = glob.glob(os.path.join(info["exp_path"], "model", "epoch*.ckpt"))
    assert len(ckpts) == 1 and os.path.isdir(ckpts[0])

    cfg2 = tiny_cfg(epochs=2, resume=ckpts[0], ckpt_format="orbax")
    state2, _, _ = run_pretrain(cfg2, dataset=ds, max_steps=2)
    assert int(np.asarray(state2.step)) > int(np.asarray(state.step))


def test_ubernce_e2e(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(model="ubernce")
    ds = _dataset(synth, cfg)
    _, _, info = run_pretrain(cfg, dataset=ds, max_steps=2)
    assert np.isfinite(info["train_acc"])


def test_coclr_cycle_from_pretrained(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # stage 1: two quick InfoNCE runs stand in for rgb and flow checkpoints
    cfg = tiny_cfg(name_prefix="rgb_")
    _, _, info_rgb = run_pretrain(cfg, dataset=_dataset(synth, cfg), max_steps=1)
    cfg = tiny_cfg(name_prefix="flow_")
    _, _, info_flow = run_pretrain(cfg, dataset=_dataset(synth, cfg), max_steps=1)
    ckpt_rgb = glob.glob(os.path.join(info_rgb["exp_path"], "model", "*.ckpt"))[0]
    ckpt_flow = glob.glob(os.path.join(info_flow["exp_path"], "model", "*.ckpt"))[0]

    # stage 2: CoCLR with the two-checkpoint surgery init
    # global batch 8, K=32 -> 4 fill steps; 2 batches/epoch x 3 epochs = 6
    cfg = tiny_cfg(model="coclr", dataset="ucf101-2stream-2clip", topk=2,
                   epochs=3, pretrain=(ckpt_rgb, ckpt_flow))
    ds2 = UCF101_2STREAM_LMDB_2CLIP(
        root=synth["root"], db_path_rgb=synth["db_path"],
        db_path_flow=synth["db_path_flow"], mode="train",
        num_frames=cfg.seq_len, return_label=True, return_source=True,
        img_dim=cfg.img_dim, seed=cfg.seed)
    state, _, info = run_pretrain(cfg, dataset=ds2)
    assert np.isfinite(info["train_acc"])
    assert bool(np.all(np.asarray(state.queue_label) != -1))  # queue filled

def test_infonce_single_device(synth, tmp_path, monkeypatch):
    """num_devices=1 takes the mesh=None upload path (dict batches must be
    uploaded per-leaf; regression for the single-chip CLI)."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(num_devices=1, moco_k=8)
    ds = _dataset(synth, cfg)
    _, _, info = run_pretrain(cfg, dataset=ds, max_steps=2)
    assert np.isfinite(info["train_acc"])
