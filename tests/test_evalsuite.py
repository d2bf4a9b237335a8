"""Eval suite: classifier train/probe, retrieval, N-crop TTA, fusion."""

import json
import os

import jax
import numpy as np
import pytest

from coclr_tpu.config import EvalConfig
from coclr_tpu.data import hostaug
from coclr_tpu.data.datasets import UCF101LMDB
from coclr_tpu.data.synthetic import make_synthetic_ucf
from coclr_tpu.evalsuite import driver, merge, ncrop, retrieval
from coclr_tpu.evalsuite.feature_probe import run_feature_probe


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_eval")
    return make_synthetic_ucf(str(root), n_classes=2, n_groups=5, n_clips=2,
                              n_frames=20, size=(48, 64), flow=False)


def eval_cfg(**kw):
    base = dict(net="tiny", dataset="ucf101", seq_len=4, img_dim=32,
                batch_size=1, epochs=1, workers=2, compute_dtype="float32",
                schedule=(100,), optim="sgd", lr=0.01)
    base.update(kw)
    return EvalConfig(**base)


def _ds(synth, cfg, mode, policy=None, window=False):
    return UCF101LMDB(root=synth["root"], db_path=synth["db_path"], mode=mode,
                      num_frames=cfg.seq_len, ds=cfg.ds, return_label=True,
                      img_dim=cfg.img_dim, seed=cfg.seed, policy=policy,
                      window=window)


@pytest.mark.parametrize("train_what", ["last", "ft"])
def test_classifier_train(synth, tmp_path, monkeypatch, train_what):
    monkeypatch.chdir(tmp_path)
    cfg = eval_cfg(train_what=train_what)
    state, info = driver.run_classifier_train(
        cfg, train_dataset=_ds(synth, cfg, "train"),
        val_dataset=_ds(synth, cfg, "val"), max_steps=2)
    assert 0.0 <= info["best_acc"] <= 1.0
    assert os.path.exists(os.path.join(info["exp_path"], "model",
                                       "epoch0.ckpt"))


def test_linear_probe_freezes_backbone(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = eval_cfg(train_what="last", prefix="freeze")
    model = driver.build_model(cfg)
    state0 = driver.init_classifier_state(cfg, model)
    from coclr_tpu.evalsuite.steps import make_classifier_steps
    import jax.numpy as jnp

    train_step, _, tx = make_classifier_steps(model, cfg, mesh=None)
    opt_state = tx.init(state0.params)
    batch = {
        "seq": jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (4, cfg.seq_len, 32, 32, 3), np.uint8)),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    params0 = jax.device_get(state0.params)      # donate-safe host copies
    stats0 = jax.device_get(state0.batch_stats)
    state1, _, m = train_step(state0, opt_state, batch,
                              jax.random.PRNGKey(0), jnp.float32(0.1))
    # backbone params unchanged; head changed
    for a, b in zip(jax.tree_util.tree_leaves(params0["backbone"]),
                    jax.tree_util.tree_leaves(state1.params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(state1.params["final_fc"]["kernel"])
                  - np.asarray(params0["final_fc"]["kernel"])).max() > 0
    # backbone BN running stats unchanged (model.eval() semantics)
    for a, b in zip(
            jax.tree_util.tree_leaves(stats0["backbone"]),
            jax.tree_util.tree_leaves(state1.batch_stats["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # final_bn stats DO update (final_bn.train() semantics)
    assert np.abs(np.asarray(state1.batch_stats["final_bn"]["mean"])
                  - np.asarray(stats0["final_bn"]["mean"])).max() > 0


def test_eval_metrics_ignore_padding():
    """Val metrics must be invariant to the batch-size remainder: padded
    duplicate rows (driver.py pads the final partial batch to a device
    multiple) are masked out of the metric means (VERDICT r1 weak #2)."""
    import jax.numpy as jnp

    from coclr_tpu.evalsuite.steps import make_classifier_steps
    from coclr_tpu.parallel import make_mesh

    cfg = eval_cfg()
    model = driver.build_model(cfg)
    state = driver.init_classifier_state(cfg, model)
    rng = np.random.RandomState(1)
    seq = rng.randint(0, 255, (5, cfg.seq_len, 32, 32, 3), np.uint8)
    label = rng.randint(0, 101, (5,)).astype(np.int32)

    _, eval_step, _ = make_classifier_steps(model, cfg, mesh=None)
    exact, _, _ = eval_step(state, {"seq": jnp.asarray(seq),
                                    "label": jnp.asarray(label)})

    pad = 3
    seq_p = np.concatenate([seq] + [seq[-1:]] * pad)
    label_p = np.concatenate([label] + [label[-1:]] * pad)
    valid = np.concatenate([np.ones(5), np.zeros(pad)]).astype(np.float32)
    batch_p = {"seq": jnp.asarray(seq_p), "label": jnp.asarray(label_p),
               "valid": jnp.asarray(valid)}

    padded, _, _ = eval_step(state, batch_p)
    for k in ("loss", "top1", "top5"):
        np.testing.assert_allclose(float(padded[k]), float(exact[k]),
                                   rtol=1e-5, atol=1e-6)
    assert float(padded["count"]) == 5

    # same invariance through the sharded (8-device) eval step
    _, eval_step8, _ = make_classifier_steps(model, cfg, mesh=make_mesh(8))
    padded8, _, _ = eval_step8(state, batch_p)
    for k in ("loss", "top1", "top5"):
        np.testing.assert_allclose(float(padded8[k]), float(exact[k]),
                                   rtol=1e-5, atol=1e-6)


def test_retrieval_pipeline(synth, tmp_path):
    cfg = eval_cfg()
    model = driver.build_model(cfg)
    state = driver.init_classifier_state(cfg, model)
    policy = hostaug.EvalClipPolicy(img_dim=cfg.img_dim, mode="test",
                                    crop_where=5, crop_size=32)
    train_ds = _ds(synth, cfg, "train", policy=policy, window=True)
    test_ds = _ds(synth, cfg, "test", policy=policy, window=True)
    cache = str(tmp_path / "feature")
    res = retrieval.run_retrieval(model, state, cfg, train_ds, test_ds, cache)
    assert set(res) == {1, 5, 10, 20, 50}
    assert all(0.0 <= v <= 1.0 for v in res.values())
    for split in ("train", "test"):
        assert os.path.exists(
            os.path.join(cache, f"ucf101_{split}_feature.pth.tar"))
    # cache reuse path
    res2 = retrieval.run_retrieval(model, state, cfg, train_ds, test_ds, cache)
    assert res2 == res


def test_feature_probe(tmp_path):
    rng = np.random.RandomState(0)
    # separable toy features
    f_tr = np.concatenate([rng.randn(50, 8) + 2, rng.randn(50, 8) - 2])
    l_tr = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.int64)
    f_te = np.concatenate([rng.randn(20, 8) + 2, rng.randn(20, 8) - 2])
    l_te = np.concatenate([np.zeros(20), np.ones(20)]).astype(np.int64)
    vnames = [f"Class{int(l)}/v_{i}" for i, l in enumerate(l_te)]
    prob_path = str(tmp_path / "lp-prob.json")
    best_acc, _ = run_feature_probe(
        f_tr, l_tr, f_te, l_te, test_vname=vnames, lr=0.1, epochs=10,
        batch_size=32, schedule=(6, 8), final_bn=True,
        prob_json_path=prob_path)
    assert best_acc > 0.9
    with open(prob_path) as fp:
        stat = json.load(fp)
    assert len(stat) == 40


def test_ncrop_and_merge(synth, tmp_path):
    cfg = eval_cfg(center_crop=True)
    model = driver.build_model(cfg)
    state = driver.init_classifier_state(cfg, model)

    def make_dataset(policy):
        policy.crop_size = 32
        return _ds(synth, cfg, "test", policy=policy, window=True)

    out1 = str(tmp_path / "out1")
    res = ncrop.run_ncrop_test(model, state, cfg, make_dataset, out1, "ckptA")
    assert "center" in res
    p1 = os.path.join(out1, "ckptA-prob-center.json")
    assert os.path.exists(p1)

    # fusion mode c: merge the file with itself -> accuracies equal
    classes = ["Class00", "Class01"]
    a1, a2, am = merge.merge_prob(p1, p1, classes)
    assert a1 == a2 == am

    # fusion mode s over feature caches (rgb + pseudo-flow)
    policy = hostaug.EvalClipPolicy(img_dim=cfg.img_dim, mode="test",
                                    crop_where=5, crop_size=32)
    test_ds = _ds(synth, cfg, "test", policy=policy, window=True)
    train_ds = _ds(synth, cfg, "train", policy=policy, window=True)
    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    for split, ds in (("train", train_ds), ("test", test_ds)):
        f, l, v = retrieval.extract_features(model, state, ds, cfg)
        retrieval.save_feature_cache(d1, "ucf101", split, f, l, v)
        retrieval.save_feature_cache(d2, "ucf101-f", split, f, l, v)
    res = merge.merge_sim(d1, d2, "ucf101")
    assert set(res) == {1, 5, 10, 20, 50}


def test_eval_crop_double_resample():
    """EvalClipPolicy reproduces the reference's two-pass eval resampling
    (RandomSizedCrop -> 224 intermediate -> Scale(img_dim), both bicubic,
    eval/main_classifier.py:729-744); the FiveCrop path resamples once
    (the 224x224 crop is not resized by FiveCrop, only Scale)."""
    import cv2

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (300, 340, 3), np.uint8)

    # random-sized path: crop rect != crop_size -> two passes
    rect = (10, 20, 200, 260)  # x, y, w, h
    x, y, w, h = rect
    img_dim, cs = 128, 224
    got = hostaug.crop_resize_double(frame, rect, cs, img_dim)
    mid = cv2.resize(frame[y:y + h, x:x + w], (cs, cs),
                     interpolation=cv2.INTER_CUBIC)
    want = cv2.resize(mid, (img_dim, img_dim),
                      interpolation=cv2.INTER_CUBIC)
    np.testing.assert_array_equal(got, want)
    single = cv2.resize(frame[y:y + h, x:x + w], (img_dim, img_dim),
                        interpolation=cv2.INTER_CUBIC)
    assert np.abs(got.astype(int) - single.astype(int)).max() > 0

    # five-crop path: patch already crop_size x crop_size -> ONE pass
    rect224 = (5, 7, 224, 224)
    got5 = hostaug.crop_resize_double(frame, rect224, cs, img_dim)
    want5 = cv2.resize(frame[7:7 + 224, 5:5 + 224], (img_dim, img_dim),
                       interpolation=cv2.INTER_CUBIC)
    np.testing.assert_array_equal(got5, want5)

    # policy plumbs the chain (mode='val' random-sized path)
    policy = hostaug.EvalClipPolicy(img_dim=64, mode="val", crop_size=128)
    clip = policy.crop_clip(np.random.RandomState(3), [frame, frame])
    assert clip.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(clip[0], clip[1])  # consistent crop


def test_preprocess_train_pallas_matches_xla():
    """The classifier train preprocess's Pallas path (fused jitter+normalize
    kernel, round 5) must match the XLA positional-select chain — shared
    parameter draws (augment.eval_color_jitter_params), so the only
    difference is f32-vs-compute-dtype rounding (here both f32)."""
    import jax.numpy as jnp

    from coclr_tpu.evalsuite.steps import preprocess_train

    r = np.random.RandomState(3)
    x = jnp.asarray(r.randint(0, 255, (4, 3, 16, 16, 3)).astype(np.uint8))
    # several rngs so jitter triggers (p=0.3 per clip) on some samples
    for i in range(4):
        rng = jax.random.PRNGKey(100 + i)
        a = preprocess_train(x, rng, jnp.float32, backend="xla")
        b = preprocess_train(x, rng, jnp.float32, backend="pallas")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_preprocess_train_u8_flip_order_is_identity_change():
    """Round 5 moved the hflip to the uint8 input (before cast+jitter).
    Flip commutes with the jitter chain exactly (pixel-local ops; the
    contrast mean is flip-invariant), so jitter-then-flip must equal
    flip-then-jitter element-for-element."""
    import jax.numpy as jnp

    from coclr_tpu.evalsuite.steps import preprocess_train
    from coclr_tpu.ops import augment

    r = np.random.RandomState(5)
    x = jnp.asarray(r.randint(0, 255, (4, 3, 16, 16, 3)).astype(np.uint8))
    rng = jax.random.PRNGKey(77)
    new = preprocess_train(x, rng, jnp.float32, backend="xla")
    # the round-4 order: cast -> jitter -> flip -> normalize
    k_jit, k_flip = jax.random.split(rng)
    old = x.astype(jnp.float32) / 255.0
    old = augment.eval_color_jitter(old, k_jit, p=0.3,
                                    strength=(0.4, 0.4, 0.4, 0.1))
    do = jax.random.uniform(k_flip, (x.shape[0],)) < 0.5
    old = jnp.where(do[:, None, None, None, None],
                    old[:, :, :, ::-1, :], old)
    old = augment.normalize(old, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-6, atol=1e-6)
