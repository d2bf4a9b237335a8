"""Typed configuration. Field names mirror the reference CLI flags
(/root/reference/main_nce.py:38-93, main_coclr.py:38-95) so the CLI overlay is
one-to-one; TPU-specific knobs are additive."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp

DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


@dataclasses.dataclass
class PretrainConfig:
    # reference flags (main_nce.py:38-93)
    net: str = "s3d"
    model: str = "infonce"              # infonce | ubernce | coclr
    dataset: str = "ucf101-2clip"
    seq_len: int = 32
    num_seq: int = 2
    ds: int = 1
    batch_size: int = 32                # per-device (reference: per-GPU)
    lr: float = 1e-3
    schedule: Tuple[int, ...] = (120, 160)
    wd: float = 1e-5
    epochs: int = 10
    start_epoch: int = 0
    print_freq: int = 5
    save_freq: int = 1
    img_dim: int = 128
    prefix: str = "pretrain"
    name_prefix: str = ""
    workers: int = 16
    seed: int = 0
    resume: str = ""
    pretrain: str = ""
    test: str = ""

    # moco flags
    moco_dim: int = 128
    moco_k: int = 2048
    moco_m: float = 0.999
    moco_t: float = 0.07

    # coclr flags (main_coclr.py:42-43,92)
    topk: int = 5
    reverse: bool = False
    cos: bool = False                   # cosine LR (dead flag upstream; real here)

    # TPU-native knobs
    compute_dtype: str = "bfloat16"
    bn_shuffle: str = "gather"          # gather | alltoall | none
    aug_order: str = "shuffle"          # shuffle (per-clip random, reference
                                        # semantics) | fixed (b->c->s->h)
    aug_backend: str = "auto"           # auto | pallas | xla
    num_devices: int = 0                # 0 = all local devices
    dcn_size: int = 1                   # >1: multi-slice DP over a dcn axis
    sp_size: int = 1                    # >1: temporal sequence parallelism —
                                        # clips sharded along T over an `sp`
                                        # mesh axis (ops/seqpar.py); batch is
                                        # then sharded over n_dev/sp_size
                                        # data shards. All backbones.
    sph_size: int = 1                   # >1: SPATIAL sequence parallelism —
                                        # clip height sharded over an `sph`
                                        # axis (innermost); composes with
                                        # sp_size (batch shards over
                                        # n_dev/(sp*sph)). img_dim must keep
                                        # H/sph divisible by the backbone's
                                        # total spatial stride (32).
    decode_size: Tuple[int, int] = (136, 180)  # canonical host decode H, W
    data_root: str = ""                 # LMDB root (reference lmdb_root)
    worker_mode: str = "thread"         # loader workers: thread | process
    profile_steps: int = 0              # >0: trace N steps of first epoch
    ckpt_format: str = "flax"           # flax (single file) | orbax (sharded
                                        # dir; resharding resume, multi-host)
    # multi-host: one JAX process per TPU host (parallel/multihost.py).
    # --multihost auto-detects on TPU pods; the explicit coordinator
    # triple is for CPU/GPU clusters and the 2-process equivalence test.
    multihost: bool = False
    coordinator: str = ""               # "host:port" rendezvous address
    num_processes: int = 0              # with coordinator: world size
    process_id: int = -1                # with coordinator: this host's rank

    @property
    def dtype(self):
        return DTYPES[self.compute_dtype]


@dataclasses.dataclass
class EvalConfig:
    # reference flags (eval/main_classifier.py:37-77)
    net: str = "s3d"
    model: str = "lincls"
    dataset: str = "ucf101"
    which_split: int = 1
    seq_len: int = 32
    ds: int = 1
    batch_size: int = 32
    lr: float = 1e-3
    schedule: Tuple[int, ...] = (60, 80)
    wd: float = 1e-3
    dropout: float = 0.9
    epochs: int = 10
    start_epoch: int = 0
    img_dim: int = 128
    print_freq: int = 5
    optim: str = "sgd"
    train_what: str = "last"            # last | ft | all
    seed: int = 0
    workers: int = 16
    resume: str = ""
    pretrain: str = ""
    test: str = ""
    retrieval: bool = False
    ten_crop: bool = False
    center_crop: bool = False
    five_crop: bool = False
    prefix: str = "linclr"
    name_prefix: str = ""

    compute_dtype: str = "bfloat16"
    num_devices: int = 0
    sp_size: int = 1                    # >1: temporal sequence parallelism
                                        # for the finetune/probe train+eval
                                        # steps (see PretrainConfig.sp_size)
    sph_size: int = 1                   # >1: spatial sequence parallelism
                                        # (see PretrainConfig.sph_size)
    max_windows: int = 0                # >0: eval datasets decode only the
                                        # CENTER max_windows hop windows per
                                        # video (datasets.py rationale); 0 =
                                        # reference protocol (all windows)
    decode_size: Tuple[int, int] = (136, 180)
    data_root: str = ""
    worker_mode: str = "thread"         # loader workers: thread | process
    ckpt_format: str = "flax"           # flax | orbax (see PretrainConfig)

    @property
    def dtype(self):
        return DTYPES[self.compute_dtype]
