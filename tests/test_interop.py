"""Checkpoint-level fidelity: MoCo state <-> reference torch state_dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coclr_tpu.models import moco
from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.utils import torch_interop

DIM, K, T, S = 16, 32, 4, 16


def make_state(variant):
    enc = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)
    return enc, moco.init_moco_state(
        jax.random.PRNGKey(3), enc, variant,
        jnp.zeros((1, T, S, S, 3), jnp.float32), dim=DIM, K=K)


@pytest.mark.parametrize("variant", ["infonce", "coclr"])
def test_moco_state_roundtrip(variant):
    _, state = make_state(variant)
    sd = torch_interop.torch_from_moco_state(state, variant)
    assert "encoder_q.2.weight" in sd and "encoder_k.4.bias" in sd
    assert sd["queue"].shape == (DIM, K)
    if variant == "coclr":
        assert "sampler.2.weight" in sd and sd["queue_second"].shape == (DIM, K)

    _, template = make_state(variant)
    back = torch_interop.moco_state_from_torch(sd, template, variant)
    for a, b in zip(jax.tree_util.tree_leaves(state.params_q),
                    jax.tree_util.tree_leaves(back.params_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.queue), np.asarray(back.queue),
                               atol=1e-6)
    if variant == "coclr":
        np.testing.assert_array_equal(np.asarray(state.queue_vname),
                                      np.asarray(back.queue_vname))


def test_torch_file_roundtrip(tmp_path):
    """Full .pth.tar write/read with reference dict schema."""
    _, state = make_state("infonce")
    sd = torch_interop.torch_from_moco_state(state, "infonce")
    path = str(tmp_path / "ck.pth.tar")
    torch_interop.save_torch_checkpoint(path, sd, epoch=7, best_acc=0.5,
                                        iteration=123)
    ckpt = torch_interop.load_torch_checkpoint(path)
    assert ckpt["epoch"] == 7 and ckpt["iteration"] == 123
    np.testing.assert_allclose(ckpt["state_dict"]["queue"], sd["queue"],
                               atol=0)


@pytest.mark.parametrize("fmt", ["flax", "orbax"])
def test_converter_cli_from_torch(tmp_path, fmt):
    """tools/convert_checkpoint.py --from-torch writes a loadable native
    checkpoint in either backend (--ckpt_format)."""
    import os
    import subprocess
    import sys

    from coclr_tpu.utils.checkpoint import is_orbax_checkpoint, load_checkpoint

    _, state = make_state("infonce")
    sd = torch_interop.torch_from_moco_state(state, "infonce")
    src = str(tmp_path / "in.pth.tar")
    dst = str(tmp_path / "out.ckpt")
    torch_interop.save_torch_checkpoint(src, sd, epoch=7, best_acc=0.5,
                                        iteration=123)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py"),
         src, dst, "--from-torch", "--model", "infonce", "--net", "tiny",
         "--moco-dim", str(DIM), "--moco-k", str(K), "--seq_len", str(T),
         "--img_dim", str(S), "--ckpt_format", fmt],
        check=True, env=env, cwd=repo, timeout=300)
    assert is_orbax_checkpoint(dst) == (fmt == "orbax")
    out = load_checkpoint(dst)
    assert out["epoch"] == 7
    np.testing.assert_allclose(np.asarray(out["state"]["queue"]),
                               np.asarray(state.queue), atol=1e-6)


def test_exported_encoder_runs_in_torch_shape():
    """Exported proj-encoder keys follow the reference Sequential grammar
    (encoder_q.0 backbone / .2 / .4 convs) with 5-D conv weights."""
    _, state = make_state("infonce")
    sd = torch_interop.torch_from_flax_proj_encoder(
        {"params": state.params_q, "batch_stats": state.stats_q}, "encoder_q.")
    assert sd["encoder_q.2.weight"].ndim == 5
    assert sd["encoder_q.4.weight"].shape[:2] == (DIM, 32)  # [out,in,...]
    assert any(k.startswith("encoder_q.0.") for k in sd)
