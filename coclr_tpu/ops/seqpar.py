"""Temporal sequence parallelism (SP) primitives.

The reference has NO sequence/context parallelism of any kind (SURVEY §2.8,
§5.7: seq_len is fixed and every clip is processed whole on one GPU; its
memory scaling is conv striding). §5.7 names the natural TPU extension
point: "spatial/temporal sharding of activations under shard_map if
long-clip configs are added". This module is that extension — additive,
TPU-native, no reference counterpart.

Design: the clip's time axis is sharded over an `sp` mesh axis. The 3D-CNN
backbones are temporally local (separable (k,1,1) convs and max pools with
k<=7), so the only cross-shard communication is
  - a halo exchange (`temporal_halo`, one `ppermute` per neighbor) before
    each temporal-kernel op, turning its padded conv/pool into a VALID op
    on the halo-extended local block — numerically exact vs the unsharded
    program (see the tiling argument in `temporal_halo`), and
  - a `pmean` over `sp` wherever the unsharded program reduces over time:
    global average pooling, self-gating means, and BatchNorm batch
    statistics (whose per-device scope stays "this data shard's batch,
    full T", preserving the MoCo shuffle-BN semantics).

Activation memory per device scales as 1/sp_size through the whole
backbone, which is what makes long-clip (seq_len >> 32) configs fit; the
raw [T, H, W, 3] input and the pooled heads are small and stay replicated.

Gradient correctness: the backbone's pooled output feeds the projection
head REDUNDANTLY on every sp member (each holds the identical pmean'd
feature), while backbone activations are member-local. `pmean_exact` pins
the mathematically exact transpose (bwd: psum(ct)/n) rather than relying
on the collective transpose rules of shard_map's check_rep=False mode, so
one uniform `pmean` of the grads over (data..., sp) yields the true
gradient for BOTH parameter groups (head grads are replicated; backbone
member grads come out exactly sp_size x their true per-member
contribution). Asserted to f32 tolerance against the unsharded step in
tests/test_seqpar.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

SP_AXIS = "sp"  # single source of truth; parallel/mesh.py re-exports it


def temporal_halo(x, lo: int, hi: int, axis_name: str):
    """Extend the local time axis (axis 1 of [B, T_loc, ...]) with `lo`
    trailing frames from the left neighbor and `hi` leading frames from the
    right neighbor. Global edges receive zeros (`ppermute` zero-fills
    shards with no source), which equals the explicit zero padding the
    unsharded temporal convs use; for the post-ReLU max pools a zero edge
    is value-identical to torch's implicit -inf padding (window max >= 0).

    Exactness: a global conv with symmetric pad p, kernel k=2p+1, stride s
    over T = n*T_loc tiles into per-shard VALID convs over [halo_p, local,
    halo_p] with T_loc/s outputs each, because shard i's local output j
    reads padded-global input [ (i*T_loc/s + j)*s - p , ... + k-1 ] — all
    inside the halo-extended block. Requires T_loc % s == 0.
    """
    assert lo <= x.shape[1] and hi <= x.shape[1], (
        f"halo ({lo},{hi}) exceeds the local T chunk {x.shape[1]}: "
        f"increase seq_len or decrease sp_size")
    parts = []
    n = jax.lax.axis_size(axis_name)
    if lo:
        # shard i receives the last `lo` frames of shard i-1
        src_dst = [(i, i + 1) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[:, x.shape[1] - lo:], axis_name,
                                      src_dst))
    parts.append(x)
    if hi:
        # shard i receives the first `hi` frames of shard i+1
        src_dst = [(i + 1, i) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[:, :hi], axis_name, src_dst))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmean_exact(x, axis_name):
    return jax.lax.pmean(x, axis_name)


def _pmean_exact_fwd(x, axis_name):
    return jax.lax.pmean(x, axis_name), None


def _pmean_exact_bwd(axis_name, _res, ct):
    # exact transpose of pmean = psum(ct)/n: the cotangents of a pmean'd
    # value may legitimately DIFFER per member (e.g. BatchNorm statistics,
    # whose cotangent on each member comes from that member's own
    # activations), and the identity/replication-assuming transpose would
    # silently drop every cross-member term.
    n = jax.lax.axis_size(axis_name)
    return (jax.lax.psum(ct, axis_name) / n,)


_pmean_exact.defvjp(_pmean_exact_fwd, _pmean_exact_bwd)


def sp_pmean(x, axis_name: Optional[str]):
    """Mean over the sp axis with the exact (cross-member) transpose.
    No-op when axis_name is None, so call sites need no branching."""
    if axis_name is None:
        return x
    return _pmean_exact(x, axis_name)


__all__ = ["SP_AXIS", "temporal_halo", "sp_pmean"]
