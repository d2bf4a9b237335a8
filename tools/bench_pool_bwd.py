"""Microbenchmark: the max-pool backward bucket (VERDICT-r2 ask #8).

The pool bucket is 17.8 ms/step at ~66% bandwidth efficiency (DESIGN.md
round-2 trace table). The remaining untried rewrite is expressing the
backward's shifted-view extraction as one-hot stride-s DEPTHWISE convs (the
trick that made space-to-depth exact and cheap) instead of strided slices
(which lower to gathers) or select_and_scatter.

Byte model first (why this is expected to LOSE, measured here to close it):
  select_and_scatter per axis moves ~(2|x| + |y|) bytes (read x twice-ish,
  read grad, write dx). The conv formulation moves: extract k taps
  (write k|y|), compare+mask (read k|y| + |y|), scatter via transposed
  one-hot conv (read k|y|, write |x|) ~= (3k|y| + |x| + ...) — at k=3, s=2
  that's ~2.2x the SaS bytes before any fusion.

This tool times, on the real chip, per pool site of the bench config
(S3D, batch 32, seq 32, 128x128):
  A. the default separable reduce_window fwd + 1-D SaS bwd (the floor),
  B. the one-hot depthwise extraction conv alone (fwd cost of the
     candidate's first stage — if B alone > A's whole bwd, the candidate
     is dead without building the full VJP),
  C. full candidate VJP (extraction + first-argmax mask + transposed
     one-hot conv scatter) if B survives.

Results recorded in DESIGN.md "Round 3".
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax_block(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3  # ms


def jax_block(out):
    """Value-fetch fence (block_until_ready under-fences on axon)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from coclr_tpu.backbones.s3d import max_pool_3d

    # pool sites at bench shapes (batch 32 -> stem t-stride 2, s /2: T=16;
    # see backbones/s3d.py:302-325 + the per-Mixed-block branch pools :267)
    SITES = [
        ("2a", (8, 16, 64, 64, 64), (1, 3, 3), (1, 2, 2), (0, 1, 1)),
        ("3a", (8, 16, 32, 32, 192), (1, 3, 3), (1, 2, 2), (0, 1, 1)),
        ("m3b", (8, 16, 16, 16, 256), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        ("4a", (8, 16, 16, 16, 480), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ("m4c", (8, 8, 8, 8, 512), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        ("5a", (8, 8, 8, 8, 832), (2, 2, 2), (2, 2, 2), (0, 0, 0)),
    ]
    # NOTE batch 8 here (not 32): per-op timing scales linearly in B; 8
    # keeps every buffer resident alongside the harness with margin.

    results = {}
    for name, shape, win, st, pad in SITES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32),
                        dtype=jnp.bfloat16)
        pads = [(p, p) for p in pad]

        # A: default separable fwd+bwd
        def fwd_bwd(x_, _w=win, _s=st, _p=pads):
            y, vjp = jax.vjp(lambda t: max_pool_3d(t, _w, _s, _p), x_)
            (dx,) = vjp(y)  # grad the same size as y
            return dx

        a_ms = _timeit(jax.jit(fwd_bwd), x)

        # B: one-hot depthwise tap-extraction conv, per pooled axis
        b_ms = 0.0
        for axis, (k, s, p) in enumerate(zip(win, st, pad), start=1):
            if k == 1 and s == 1 and p == 0:
                continue
            C = shape[-1]
            kshape = [1, 1, 1]
            kshape[axis - 1] = k
            # depthwise: feature_group_count=C, k output features per group
            kern = np.zeros(tuple(kshape) + (1, C * k), np.float32)
            for c in range(C):
                for d in range(k):
                    idx = [0, 0, 0]
                    idx[axis - 1] = d
                    kern[tuple(idx) + (0, c * k + d)] = 1.0
            kern = jnp.asarray(kern, jnp.bfloat16)
            strides = [1, 1, 1]
            strides[axis - 1] = s
            padding = [(0, 0)] * 3
            padding[axis - 1] = (p, p)

            def extract(x_, _kern=kern, _strides=tuple(strides),
                        _padding=tuple(padding), _C=C):
                return jax.lax.conv_general_dilated(
                    x_, _kern, window_strides=_strides, padding=_padding,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    feature_group_count=_C)

            b_ms += _timeit(jax.jit(extract), x)

        results[name] = {"sas_fwd_bwd_ms": round(a_ms, 2),
                         "onehot_extract_ms": round(b_ms, 2)}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
