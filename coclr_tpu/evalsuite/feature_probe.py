"""Linear probe on cached features (eval/feature_linear_probe.py).

Tiny BN?+FC head over the retrieval feature cache, SGD momentum 0.9, stateless
step LR decay, best-checkpoint prob json dump. Runs as one jitted full-batch
scan per epoch (the dataset is a few thousand x 1024 floats — minibatching
over PCIe would be pure overhead on TPU; shuffled minibatches are emulated
inside the scan)."""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from coclr_tpu.train.lr import step_schedule


def init_lp(rng, dim: int, num_class: int, use_bn: bool):
    k1, _ = jax.random.split(rng)
    params = {
        "fc_kernel": jax.random.normal(k1, (dim, num_class)) * 0.01,
        "fc_bias": jnp.zeros((num_class,)),
    }
    if use_bn:
        params["bn_scale"] = jnp.ones((dim,))
        params["bn_bias"] = jnp.zeros((dim,))
    stats = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))} if use_bn \
        else {}
    return params, stats


def lp_forward(params, stats, x, train: bool):
    if "bn_scale" in params:
        if train:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            new_stats = {"mean": 0.9 * stats["mean"] + 0.1 * mean,
                         "var": 0.9 * stats["var"] + 0.1 * var}
        else:
            mean, var = stats["mean"], stats["var"]
            new_stats = stats
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = x * params["bn_scale"] + params["bn_bias"]
    else:
        new_stats = stats
    return x @ params["fc_kernel"] + params["fc_bias"], new_stats


def run_feature_probe(train_feature, train_label, test_feature, test_label,
                      test_vname=None, lr: float = 1.0, wd: float = 1e-3,
                      epochs: int = 100, batch_size: int = 1024,
                      schedule=(60, 80), normalize: bool = False,
                      final_bn: bool = False, eval_freq: int = 5,
                      seed: int = 0, prob_json_path: str = ""):
    """Returns (best_acc, best_epoch). Mirrors feature_linear_probe.py:80-149."""
    if np.shape(train_feature)[0] == 0:
        raise ValueError("run_feature_probe: empty train feature set")
    train_feature = jnp.asarray(train_feature, jnp.float32)
    test_feature = jnp.asarray(test_feature, jnp.float32)
    train_label = jnp.asarray(train_label, jnp.int32)
    test_label = jnp.asarray(test_label, jnp.int32)
    if normalize:
        train_feature = train_feature / jnp.maximum(
            jnp.linalg.norm(train_feature, axis=1, keepdims=True), 1e-12)
        test_feature = test_feature / jnp.maximum(
            jnp.linalg.norm(test_feature, axis=1, keepdims=True), 1e-12)

    dim = train_feature.shape[-1]
    num_class = int(jnp.max(train_label)) + 1
    rng = jax.random.PRNGKey(seed)
    params, stats = init_lp(rng, dim, num_class, final_bn)
    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.trace(decay=0.9))
    opt_state = tx.init(params)

    n = train_feature.shape[0]
    batch_size = min(batch_size, n)  # tiny datasets: one full batch
    steps = max(1, -(-n // batch_size))

    @jax.jit
    def train_epoch(params, stats, opt_state, key, lr_now):
        perm = jax.random.permutation(key, n)
        # wrap-pad to a whole number of batches (pad < batch_size <= n)
        pad = steps * batch_size - n
        idx = jnp.concatenate([perm, perm[:pad]]).reshape(steps, batch_size)

        def body(carry, batch_idx):
            params, stats, opt_state = carry
            xb = train_feature[batch_idx]
            yb = train_label[batch_idx]

            def loss_fn(p):
                logits, new_stats = lp_forward(p, stats, xb, train=True)
                logz = jax.nn.logsumexp(logits, axis=1)
                ll = jnp.take_along_axis(logits, yb[:, None], axis=1)[:, 0]
                return jnp.mean(logz - ll), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree_util.tree_map(lambda u: -lr_now * u, updates))
            return (params, new_stats, opt_state), loss

        (params, stats, opt_state), losses = jax.lax.scan(
            body, (params, stats, opt_state), idx)
        return params, stats, opt_state, jnp.mean(losses)

    @jax.jit
    def evaluate(params, stats):
        logits, _ = lp_forward(params, stats, test_feature, train=False)
        acc = jnp.mean((jnp.argmax(logits, axis=1) == test_label)
                       .astype(jnp.float32))
        return acc, jax.nn.softmax(logits, axis=1)

    best_acc, best_epoch, best = 0.0, 0, (params, stats)
    for epoch in range(epochs):
        lr_now = step_schedule(lr, epoch, schedule)
        params, stats, opt_state, loss = train_epoch(
            params, stats, opt_state, jax.random.fold_in(rng, epoch),
            jnp.float32(lr_now))
        if epoch % eval_freq == 0:
            acc, _ = evaluate(params, stats)
            acc = float(acc)
            if acc >= best_acc:
                best_acc, best_epoch = acc, epoch
                best = (jax.device_get(params), jax.device_get(stats))
                print("Best acc: %.4f" % acc)

    print("Final best acc: %.4f" % best_acc)
    if prob_json_path and test_vname is not None:
        _, probs = evaluate(best[0], best[1])
        probs = np.asarray(probs)
        stat: Dict[str, list] = {}
        for v, p in zip(test_vname, probs):
            if isinstance(v, (list, tuple)):
                v = v[0]
            stat[v] = p.tolist()
        os.makedirs(os.path.dirname(prob_json_path) or ".", exist_ok=True)
        with open(prob_json_path, "w") as fp:
            json.dump(stat, fp)
        print("prob saved to %s" % prob_json_path)
    return best_acc, best_epoch
