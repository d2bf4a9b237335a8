"""Pallas TPU kernel: 1-D max-pool backward (first-argmax routing).

XLA lowers the VJP of a 1-D reduce_window max as select_and_scatter, which
profiled at ~10ms/step across S3D's pools (after the 3-D -> separable 1-D
rewrite already halved it). Its data-movement floor is one read each of
x/out/g plus one grad write; this kernel hits that by keeping the whole
pooled axis in VMEM per block.

Layout contract: the caller reshapes the tensor to [P, N, Q] where N is the
pooled axis (P = leading product, Q = trailing product, both contiguous —
reshapes of contiguous arrays are free). The grid tiles (P, Q); each program
sees x [1, N, qb], out/g [1, M, qb] and walks the k taps with static
shifted slices, accumulating a `taken` mask so ties route to the first
window position — matching select_and_scatter bitwise (tested).

Semantics reference: torch MaxPool3d backward (cuDNN first-argmax), s3dg.py
pool sites /root/reference/backbone/s3dg.py:151,162,173,190.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

QB = 128  # lane tile


def _bwd_kernel(x_ref, out_ref, g_ref, grad_ref, *, k, s, lo, n, m):
    # all-f32 internals: bf16 compares and mixed-dtype selects hit Mosaic
    # lowering gaps ("target does not support this comparison" / "invalid
    # vector register cast"); casting at the block boundary is cheap and
    # bf16->f32 is lossless
    x = x_ref[0].astype(jnp.float32)      # [N, qb]
    out = out_ref[0].astype(jnp.float32)  # [M, qb]
    g = g_ref[0].astype(jnp.float32)      # [M, qb]
    qb = x.shape[-1]

    def row_pad(v, front, back):
        """Pad/trim rows to fit [*, qb] between static bounds (no scatter —
        pallas kernels may not capture scatter index constants)."""
        parts = []
        if front > 0:
            parts.append(jnp.zeros((front, qb), v.dtype))
        parts.append(v if back >= 0 else v[:v.shape[0] + back])
        if back > 0:
            parts.append(jnp.zeros((back, qb), v.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    grad = jnp.zeros_like(x)
    # `taken` as f32 0/1, not bool: concat chains of i1 mask registers fail
    # to lower ("invalid vector register cast")
    taken = jnp.zeros(out.shape, jnp.float32)
    for d in range(k):
        # window w's tap d sits at input row s*w + d - lo. All bounds are
        # static, so every access below is a static (strided) slice or a
        # concat on VMEM values — no gathers, no scatters.
        start = d - lo
        w_min = (-start + s - 1) // s if start < 0 else 0
        w_max = min(m - 1, (n - 1 - start) // s)
        if w_min > w_max:
            continue
        a = s * w_min + start
        b = s * w_max + start + 1
        nw = w_max - w_min + 1
        if s > 1:
            # strided row read via reshape + phase select (strided slices on
            # refs/values don't lower in compiled Mosaic); pad the tail so
            # the row count is a multiple of s — the pad rows are unused
            # phases of the last group
            end = a + nw * s
            xc = row_pad(x[a:min(n, end)], 0, max(0, end - n))
            xd = xc.reshape(nw, s, qb)[:, 0]       # [nw, qb]
        else:
            xd = x[a:b]                            # [nw, qb]
        ow = out[w_min:w_max + 1]
        gw = g[w_min:w_max + 1]
        tw = taken[w_min:w_max + 1]
        tie = jnp.where((xd == ow) & (tw < 0.5), 1.0, 0.0)
        taken_mid = jnp.maximum(tw, tie)
        # mosaic rejects zero-row vectors: only concat non-empty pieces
        pieces = []
        if w_min > 0:
            pieces.append(taken[:w_min])
        pieces.append(taken_mid)
        if w_max + 1 < m:
            pieces.append(taken[w_max + 1:])
        taken = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 \
            else taken_mid
        gd = gw * tie
        if s > 1:
            # strided placement: interleave with zero phases then reshape
            # (explicit reshape — None-indexing doesn't lower in Mosaic)
            gd = jnp.concatenate(
                [gd.reshape(nw, 1, qb), jnp.zeros((nw, s - 1, qb), gd.dtype)],
                axis=1).reshape(nw * s, qb)
            gd = row_pad(gd, a, n - a - nw * s)
        else:
            gd = row_pad(gd, a, n - a - nw)
        grad = grad + gd
    grad_ref[0] = grad.astype(grad_ref.dtype)


def pool1d_bwd(x, out, g, k: int, s: int, lo: int, interpret: bool = False):
    """x: [P, N, Q]; out, g: [P, M, Q]. Returns grad wrt x, same shape."""
    import jax.experimental.pallas as pl

    p, n, q = x.shape
    m = out.shape[1]
    assert out.shape == (p, m, q) and g.shape == (p, m, q)
    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    # largest divisor of q under the VMEM budget: big lane blocks amortize
    # per-program overhead. Mosaic keeps ~13 live f32 row-sets on the stack
    # (x/out/g/grad + per-tap temps, double-buffered) against the 16MB
    # scoped-vmem limit, so keep a single row-set near 512KB.
    cap = max(QB, (512 * 2 ** 10) // (4 * n))
    qb = q
    while qb > cap or (q % qb):
        # walk down through divisors of q
        qb -= 1
        while qb > 1 and q % qb:
            qb -= 1
    kern = functools.partial(_bwd_kernel, k=k, s=s, lo=lo, n=n, m=m)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((p, n, q), x.dtype),
        grid=(p, q // qb),
        in_specs=[
            pl.BlockSpec((1, n, qb), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, m, qb), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, m, qb), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, n, qb), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(x, out, g)


# ---------------------------------------------------------------------------
# custom_vjp wrapper: reduce_window forward, pallas backward
# ---------------------------------------------------------------------------

import functools as _ft
import os as _os


def _rw_pool(x, axis, k, s, lo):
    win = [1] * x.ndim
    st = [1] * x.ndim
    pd = [(0, 0)] * x.ndim
    win[axis], st[axis], pd[axis] = k, s, (lo, lo)
    return jax.lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype),
                                 jax.lax.max, tuple(win), tuple(st), pd)


@_ft.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def max_pool_1d(x, axis: int, k: int, s: int, lo: int):
    """1-D max pool along `axis`: reduce_window forward (already fast), a
    VMEM-resident pallas kernel for the backward (XLA's select_and_scatter
    lowering profiled at ~10ms/step across S3D's pools; the kernel hits the
    read-x/out/g + write-grad traffic floor). Use when
    jax.default_backend() is a TPU; COCLR_POOL_BWD=xla forces the stock VJP.
    """
    return _rw_pool(x, axis, k, s, lo)


def _mp_fwd(x, axis, k, s, lo):
    out = _rw_pool(x, axis, k, s, lo)
    return out, (x, out)


def _mp_bwd(axis, k, s, lo, res, g):
    x, out = res
    shape = x.shape
    p = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    n = shape[axis]
    q = int(np.prod(shape[axis + 1:], dtype=np.int64)) if axis < len(shape) - 1 else 1
    grad = pool1d_bwd(x.reshape(p, n, q),
                      out.reshape(p, out.shape[axis], q),
                      g.reshape(p, out.shape[axis], q), k, s, lo)
    return (grad.reshape(shape),)


max_pool_1d.defvjp(_mp_fwd, _mp_bwd)


def pool_backward_mode() -> str:
    """Default 'xla': in the full S3D train step the pallas backward
    measured 480 clips/s vs select_and_scatter's 753 — the kernel's
    correctness holds (exact parity on TPU) but its small VMEM-bounded
    blocks cost more in per-program overhead and lost fusion than SaS's
    serialization. COCLR_POOL_BWD=pallas opts in (e.g. for future Mosaic
    versions or different shapes)."""
    forced = _os.environ.get("COCLR_POOL_BWD")
    if forced in ("pallas", "xla"):
        return forced
    return "xla"
