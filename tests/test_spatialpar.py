"""Spatial sequence parallelism (sph): H-axis halo exchange, SPAxes
pmean, H-sharded backbones/encoders/steps vs their unsharded twins, and
the temporal x spatial composition.

Like temporal SP (tests/test_seqpar.py), the reference has no analogue
(SURVEY §2.8/§5.7) — the contract is numerical equivalence with the
unsharded program. The halo machinery is shared (ops/seqpar._halo); what
these tests add is the H-axis wiring through every spatial kernel: the
S3D stem (1,7,7)/pools, the ResNet stem (5,7,7)/bottleneck (1,3,3) convs,
the sp-synced BN over BOTH axes, and the aug-replicated -> step-sharded
boundary in train_step.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from coclr_tpu.ops.seqpar import (SP_AXIS, SPH_AXIS, SPAxes, sp_pmean,
                                  spatial_halo)
from coclr_tpu.parallel.mesh import shard_map_fn


def test_spatial_halo_matches_global_slices():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), (SPH_AXIS,))
    x = jnp.arange(2 * 3 * 16 * 5, dtype=jnp.float32).reshape(2, 3, 16, 5)

    fn = shard_map_fn(lambda a: spatial_halo(a, 2, 1, SPH_AXIS), mesh,
                      in_specs=P(None, None, SPH_AXIS),
                      out_specs=P(None, None, SPH_AXIS))
    out = np.asarray(fn(x))  # [2, 3, 4*(4+3), 5] — shards concatenated

    xp = np.pad(np.asarray(x), ((0, 0), (0, 0), (2, 1), (0, 0)))
    h_loc = 4
    for i in range(n):
        got = out[:, :, i * (h_loc + 3):(i + 1) * (h_loc + 3)]
        want = xp[:, :, i * h_loc:i * h_loc + h_loc + 3]
        np.testing.assert_array_equal(got, want)


def test_sp_pmean_spaxes_two_axis_exact_transpose():
    """sp_pmean over an SPAxes spanning TWO mesh axes: forward is the mean
    over all members; backward is the exact psum/n transpose over both
    axes (cross-member cotangent terms kept)."""
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                (SP_AXIS, SPH_AXIS))
    sp = SPAxes(t=SP_AXIS, h=SPH_AXIS)
    x = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)

    def loss(x):
        m = sp_pmean(jnp.mean(x ** 2), sp)  # per-member stat, then pmean
        return m

    def member(x):
        v = loss(x)
        # member-local cotangents come out n x their true value under the
        # exact transpose (seqpar.py module docstring: one uniform pmean of
        # PARAM grads is exact; for member-LOCAL tensors the equivalent is
        # a local /n, since each member holds a different chunk)
        g = jax.grad(loss)(x) / 4.0
        return v, g

    v, g = shard_map_fn(member, mesh,
                        in_specs=P(SP_AXIS, SPH_AXIS),
                        out_specs=(P(), P(SP_AXIS, SPH_AXIS)))(x)
    np.testing.assert_allclose(float(v), float(np.mean(np.asarray(x) ** 2)),
                               rtol=1e-6)
    g_ref = jax.grad(lambda a: jnp.mean(a ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)


def _encoder_equiv_sph(network, b, t, hw, mesh_shape, sp_spec,
                       dtype=jnp.float32, train=True, tol=1e-5):
    """ProjectionEncoder under an H-sharded (and optionally T-sharded)
    mesh == unsharded: outputs, updated BN stats (train mode), and
    pmean-combined grads, to f32 tolerance."""
    from coclr_tpu.models.encoder import ProjectionEncoder

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (b, t, hw, hw, 3), jnp.float32)

    enc_ref = ProjectionEncoder(network=network, dim=8, dtype=dtype)
    variables = enc_ref.init(jax.random.PRNGKey(0), x[:1, :8])

    names = tuple(n for n in (sp_spec.t, sp_spec.h) if n is not None)
    ndev = int(np.prod(mesh_shape))
    mesh = Mesh(np.asarray(jax.devices()[:ndev]).reshape(mesh_shape), names)
    enc_sp = ProjectionEncoder(network=network, dim=8, dtype=dtype,
                               sp_axis=sp_spec)
    x_spec = P(None, sp_spec.t, sp_spec.h)

    if train:
        def fwd_loss(params, stats, x, enc):
            out, mut = enc.apply({"params": params, "batch_stats": stats},
                                 x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2), (out, mut["batch_stats"])

        (l_ref, (out_ref, stats_ref)), g_ref = jax.jit(
            jax.value_and_grad(fwd_loss, has_aux=True), static_argnums=3)(
                variables["params"], variables["batch_stats"], x, enc_ref)

        def member(params, stats, x):
            (l, (out, new_stats)), g = jax.value_and_grad(
                fwd_loss, has_aux=True)(params, stats, x, enc_sp)
            g = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, names), g)
            return l, out, new_stats, g

        l_sp, out_sp, stats_sp, g_sp = shard_map_fn(
            member, mesh, in_specs=(P(), P(), x_spec),
            out_specs=(P(), P(), P(), P()))(
                variables["params"], variables["batch_stats"], x)
        extra = [(stats_sp, stats_ref)]
    else:
        def loss_out(variables, x, enc):
            out = enc.apply(variables, x, train=False)
            return jnp.sum(out ** 2), out

        (l_ref, out_ref), g_ref = jax.jit(
            jax.value_and_grad(loss_out, has_aux=True), static_argnums=2)(
                variables, x, enc_ref)

        def member(variables, x):
            (l, out), g = jax.value_and_grad(loss_out, has_aux=True)(
                variables, x, enc_sp)
            g = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, names), g)
            return l, out, g

        l_sp, out_sp, g_sp = shard_map_fn(
            member, mesh, in_specs=(P(), x_spec),
            out_specs=(P(), P(), P()))(variables, x)
        extra = []

    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-4)
    for tree_sp, tree_ref in extra:
        for a, b_ in zip(jax.tree_util.tree_leaves(tree_sp),
                         jax.tree_util.tree_leaves(tree_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=tol, atol=tol)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_sp),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_tiny_encoder_sph_equivalence():
    """H-sharded tiny encoder == unsharded in TRAIN mode: spatial halos on
    the (1,3,3) stride-2 and (3,3,3) stride-2 convs, BN stats pmean'd over
    sph, pooled-feature pmean, grads through the halo transposes."""
    _encoder_equiv_sph("tiny", b=2, t=8, hw=16, mesh_shape=(4,),
                       sp_spec=SPAxes(h=SPH_AXIS))


def test_tiny_encoder_sp_sph_composition():
    """The T x H composition on a 2-D (sp, sph) mesh: both halo families in
    one program, BN/pool pmean over BOTH axes, grads pmean over both."""
    _encoder_equiv_sph("tiny", b=2, t=8, hw=16, mesh_shape=(2, 2),
                       sp_spec=SPAxes(t=SP_AXIS, h=SPH_AXIS))


def test_s3dg_encoder_sph_equivalence():
    """Full S3D-G under sph=2 == unsharded (eval-mode forward + grads,
    same rationale as test_seqpar.test_s3d_encoder_sp_equivalence): pins
    the H-halo'd stem (1,7,7) s2, all three spatial pools, every Sep
    branch's (1,3,3) conv, and SelfGating's H-partial means. hw=64 is the
    minimum under sph=2 (the block-5 (2,2,2) pool needs local H even:
    H/sph divisible by the total spatial stride 32)."""
    _encoder_equiv_sph("s3dg", b=1, t=8, hw=64, mesh_shape=(2,),
                       sp_spec=SPAxes(h=SPH_AXIS), train=False)


def test_r50_encoder_sph_equivalence():
    """ResNet-2d3d-50 under sph=2 == unsharded (eval-mode forward + grads):
    pins the H-halo'd (5,7,7) stride-2 stem, the stride-2 max pool, and
    every bottleneck's (1,3,3) conv2 (stride 1 and 2) + 1x1x1 downsample
    tiling."""
    _encoder_equiv_sph("r50", b=1, t=8, hw=64, mesh_shape=(2,),
                       sp_spec=SPAxes(h=SPH_AXIS), train=False)


def test_sph_full_step_equivalence():
    """One full InfoNCE production step on a (data=2, sph=2) mesh equals
    the (data=2) step on the same global batch — params/queue/BN
    stats/metrics — including 3 SGD steps for gradient linearity (same
    protocol as test_seqpar.test_sp_full_step_equivalence)."""
    import optax

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco as moco_mod
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.parallel import make_mesh, make_pretrain_step
    from coclr_tpu.parallel import train_step as ts
    from coclr_tpu.parallel.mesh import mesh_axes, sp_axis_of

    DIM, K, T, HW = 16, 64, 8, 16
    cfg = PretrainConfig(net="tiny", moco_dim=DIM, moco_k=K,
                         compute_dtype="float32", seq_len=T, img_dim=HW,
                         batch_size=2, model="infonce")
    enc = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)
    mesh_sph = make_mesh(4, sph_size=2)
    sp = sp_axis_of(mesh_sph)
    assert sp == SPAxes(t=None, h=SPH_AXIS), sp
    enc_sph = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32,
                                sp_axis=sp)
    state0 = moco_mod.init_moco_state(
        jax.random.PRNGKey(0), enc, "infonce",
        jnp.zeros((1, T, HW, HW, 3), jnp.float32), dim=DIM, K=K)

    def build(enc_, mesh, h_ax):
        axis_name = mesh_axes(mesh)
        fn = functools.partial(
            ts._pretrain_step, encoder=enc_, cfg=cfg, tx=optax.identity(),
            axis_name=axis_name, grad_axes=tuple(mesh.axis_names),
            preprocess_fn=None)
        specs = {"seq": P(axis_name, None, None, h_ax)}
        return jax.jit(shard_map_fn(
            fn, mesh, in_specs=(P(), P(), specs, P(), P()),
            out_specs=(P(), P(), P())))

    step_dp = build(enc, make_mesh(2), h_ax=None)
    step_sph = build(enc_sph, mesh_sph, h_ax=SPH_AXIS)
    opt0 = optax.identity().init(state0.params_q)

    s_dp, o_dp = state0, opt0
    s_sph, o_sph = state0, opt0
    for i in range(3):
        r = np.random.RandomState(i)
        batch = {"seq": jnp.asarray(
            r.rand(4, 2, T, HW, HW, 3).astype(np.float32))}
        rng = jax.random.PRNGKey(300 + i)
        s_dp, o_dp, m_dp = step_dp(s_dp, o_dp, batch, rng, 1e-2)
        s_sph, o_sph, m_sph = step_sph(s_sph, o_sph, batch, rng, 1e-2)

    np.testing.assert_allclose(float(m_sph["loss"]), float(m_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    for name in ("params_q", "params_k", "stats_q", "stats_k"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s_sph, name)),
                        jax.tree_util.tree_leaves(getattr(s_dp, name))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sph.queue),
                               np.asarray(s_dp.queue), rtol=1e-4, atol=1e-5)
    assert int(s_sph.queue_ptr) == int(s_dp.queue_ptr)

    # production builder (Adam), one step: pre-update-derived quantities
    pstep_dp, tx = make_pretrain_step(enc, cfg, make_mesh(2), None,
                                      donate=False)
    pstep_sph, _ = make_pretrain_step(enc_sph, cfg, mesh_sph, None,
                                      donate=False)
    padam0 = jax.jit(tx.init)(state0.params_q)
    r = np.random.RandomState(7)
    batch = {"seq": jnp.asarray(r.rand(4, 2, T, HW, HW, 3)
                                .astype(np.float32))}
    a_dp, _, am_dp = pstep_dp(state0, padam0, batch, jax.random.PRNGKey(9),
                              1e-3)
    a_sph, _, am_sph = pstep_sph(state0, padam0, batch,
                                 jax.random.PRNGKey(9), 1e-3)
    np.testing.assert_allclose(float(am_sph["loss"]), float(am_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_sph.queue),
                               np.asarray(a_dp.queue), rtol=1e-4, atol=1e-5)


def test_sp_sph_alltoall_full_step_composition():
    """Maximal composition: (data=2, sp=2, sph=2) — T-halo convs x H-halo
    convs x all_to_all shuffle-BN in ONE production step — equals the
    (data=2) alltoall step on the same global batch over 2 SGD steps."""
    import optax

    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco as moco_mod
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.parallel import make_mesh
    from coclr_tpu.parallel import train_step as ts
    from coclr_tpu.parallel.mesh import mesh_axes, sp_axis_of

    DIM, K, T, HW = 16, 64, 8, 16
    cfg = PretrainConfig(net="tiny", moco_dim=DIM, moco_k=K,
                         compute_dtype="float32", seq_len=T, img_dim=HW,
                         batch_size=2, model="infonce",
                         bn_shuffle="alltoall")
    enc = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)
    mesh_sp = make_mesh(8, sp_size=2, sph_size=2)
    sp = sp_axis_of(mesh_sp)
    assert sp == SPAxes(t=SP_AXIS, h=SPH_AXIS), sp
    enc_sp = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32,
                               sp_axis=sp)
    state0 = moco_mod.init_moco_state(
        jax.random.PRNGKey(0), enc, "infonce",
        jnp.zeros((1, T, HW, HW, 3), jnp.float32), dim=DIM, K=K)

    def build(enc_, mesh, t_ax, h_ax):
        axis_name = mesh_axes(mesh)
        fn = functools.partial(
            ts._pretrain_step, encoder=enc_, cfg=cfg, tx=optax.identity(),
            axis_name=axis_name, grad_axes=tuple(mesh.axis_names),
            preprocess_fn=None)
        specs = {"seq": P(axis_name, None, t_ax, h_ax)}
        return jax.jit(shard_map_fn(
            fn, mesh, in_specs=(P(), P(), specs, P(), P()),
            out_specs=(P(), P(), P())))

    step_dp = build(enc, make_mesh(2), None, None)
    step_sp = build(enc_sp, mesh_sp, SP_AXIS, SPH_AXIS)
    opt0 = optax.identity().init(state0.params_q)

    s_dp, o_dp = state0, opt0
    s_sp, o_sp = state0, opt0
    for i in range(2):
        r = np.random.RandomState(i)
        batch = {"seq": jnp.asarray(
            r.rand(4, 2, T, HW, HW, 3).astype(np.float32))}
        rng = jax.random.PRNGKey(400 + i)
        s_dp, o_dp, m_dp = step_dp(s_dp, o_dp, batch, rng, 1e-2)
        s_sp, o_sp, m_sp = step_sp(s_sp, o_sp, batch, rng, 1e-2)

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    for name in ("params_q", "params_k", "stats_q", "stats_k"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s_sp, name)),
                        jax.tree_util.tree_leaves(getattr(s_dp, name))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sp.queue),
                               np.asarray(s_dp.queue), rtol=1e-4, atol=1e-5)
    assert int(s_sp.queue_ptr) == int(s_dp.queue_ptr)


def test_sph_production_step_with_preprocess():
    """The path a user runs with --sph_size: H-REPLICATED upload and aug
    (crop/resize are not H-local), then the step's H-sharded in_specs
    slice each member's chunk at the pre->step jit boundary. (data=2,
    sph=2) == (data=2) with the REAL augmentation pipeline."""
    from coclr_tpu.config import PretrainConfig
    from coclr_tpu.models import moco as moco_mod
    from coclr_tpu.models.encoder import ProjectionEncoder
    from coclr_tpu.ops.augment import make_pretrain_preprocess
    from coclr_tpu.parallel import make_mesh, make_pretrain_step
    from coclr_tpu.parallel.mesh import sp_axis_of
    from coclr_tpu.train.pretrain import make_upload

    DIM, K, T, HW = 16, 64, 8, 16
    cfg = PretrainConfig(net="tiny", moco_dim=DIM, moco_k=K,
                         compute_dtype="float32", seq_len=T, img_dim=HW,
                         batch_size=2, model="infonce", aug_backend="xla")
    pre_fn = make_pretrain_preprocess(cfg)
    enc = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32)
    mesh_sph = make_mesh(4, sph_size=2)
    enc_sph = ProjectionEncoder(network="tiny", dim=DIM, dtype=jnp.float32,
                                sp_axis=sp_axis_of(mesh_sph))
    state0 = moco_mod.init_moco_state(
        jax.random.PRNGKey(0), enc, "infonce",
        jnp.zeros((1, T, HW, HW, 3), jnp.float32), dim=DIM, K=K)

    r = np.random.RandomState(5)
    raw = {"seq": jnp.asarray(
               r.randint(0, 255, (4, 2, T, HW, HW, 3)).astype(np.uint8)),
           "aug_base": jnp.ones((4, 2), jnp.float32)}

    results = []
    for mesh, e in ((make_mesh(2), enc), (mesh_sph, enc_sph)):
        step, tx = make_pretrain_step(e, cfg, mesh, pre_fn, donate=False)
        opt0 = jax.jit(tx.init)(state0.params_q)
        put_batch, put_repl = make_upload(mesh)
        st, op = put_repl((state0, opt0))
        st, op, m = step(st, op, put_batch(raw), jax.random.PRNGKey(21),
                         jnp.float32(1e-3))
        results.append((st, m))
    (s_dp, m_dp), (s_sph, m_sph) = results[0], results[1]
    np.testing.assert_allclose(float(m_sph["loss"]), float(m_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_sph.queue),
                               np.asarray(s_dp.queue), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_sph.stats_q),
                    jax.tree_util.tree_leaves(s_dp.stats_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sph_classifier_steps_equivalence():
    """Classifier finetune train + padded eval steps on a (data=2, sph=2)
    mesh equal the (data=2) steps — eval batches are host-augmented so
    their clips upload H-sharded directly (steps.py batch_specs)."""
    from coclr_tpu.config import EvalConfig
    from coclr_tpu.evalsuite.steps import (ClassifierState,
                                           make_classifier_steps)
    from coclr_tpu.models.classifier import LinearClassifier
    from coclr_tpu.parallel import make_mesh
    from coclr_tpu.parallel.mesh import sp_axis_of

    T, S, NC = 8, 16, 5
    cfg = EvalConfig(net="tiny", optim="sgd", wd=1e-3, dropout=0.5,
                     train_what="ft", compute_dtype="float32",
                     seq_len=T, img_dim=S, batch_size=2)

    def build(mesh):
        model = LinearClassifier(
            num_class=NC, network="tiny", dropout=cfg.dropout,
            use_dropout=True, use_l2_norm=False, use_final_bn=False,
            dtype=jnp.float32, sp_axis=sp_axis_of(mesh))
        sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, sample, train=False)
        state = ClassifierState(params=variables["params"],
                                batch_stats=variables["batch_stats"],
                                step=jnp.zeros((), jnp.int32))
        tr, ev, tx = make_classifier_steps(model, cfg, mesh)
        return state, tr, ev, tx

    s_dp, tr_dp, ev_dp, tx = build(make_mesh(2))
    s_sph, tr_sph, ev_sph, _ = build(make_mesh(4, sph_size=2))
    o_dp = jax.jit(tx.init)(s_dp.params)
    o_sph = jax.jit(tx.init)(s_sph.params)

    for i in range(2):
        r = np.random.RandomState(i)
        batch = {"seq": jnp.asarray(
                     r.randint(0, 255, (4, T, S, S, 3)).astype(np.uint8)),
                 "label": jnp.asarray(r.randint(0, NC, (4,)))}
        rng = jax.random.PRNGKey(60 + i)
        s_dp, o_dp, m_dp = tr_dp(s_dp, o_dp, batch, rng, jnp.float32(1e-2))
        s_sph, o_sph, m_sph = tr_sph(s_sph, o_sph, batch, rng,
                                     jnp.float32(1e-2))

    np.testing.assert_allclose(float(m_sph["loss"]), float(m_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    # atol 3e-5 (vs the temporal test's 1e-5): the H-partial pool/BN means
    # introduce a third f32 reduction order; measured max drift over 2 SGD
    # steps is 1.4e-5 on <2% of elements, linear in the reduce-order noise
    for a, b in zip(jax.tree_util.tree_leaves(s_sph.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-5)

    r = np.random.RandomState(9)
    ebatch = {"seq": jnp.asarray(
                  r.randint(0, 255, (4, T, S, S, 3)).astype(np.uint8)),
              "label": jnp.asarray(r.randint(0, NC, (4,))),
              "valid": jnp.asarray([1, 1, 1, 0], np.float32)}
    m_dp, lo_dp, _ = ev_dp(s_dp, ebatch)
    m_sph, lo_sph, _ = ev_sph(s_sph, ebatch)
    for k in ("loss", "top1", "top5", "count"):
        np.testing.assert_allclose(float(m_sph[k]), float(m_dp[k]),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo_sph), np.asarray(lo_dp),
                               rtol=1e-4, atol=1e-5)


def test_sph_upload_keeps_h_replicated():
    """make_upload under an (data, sph) mesh: clips stay H-REPLICATED on
    upload (the aug chain needs full H; the step slices at the jit
    boundary) and batch-sharded over data; under (data, sp, sph) clips are
    additionally T-sharded over sp only."""
    from coclr_tpu.parallel import make_mesh
    from coclr_tpu.train.pretrain import make_upload

    mesh = make_mesh(4, sph_size=2)
    put_batch, _ = make_upload(mesh)
    batch = put_batch({"seq": np.zeros((4, 2, 8, 16, 16, 3), np.uint8),
                       "label": np.zeros((4,), np.int32)})
    spec = batch["seq"].sharding.spec
    assert spec[0] == "data", spec
    assert all(s is None for s in spec[1:]), spec  # H (and T) replicated
    shard = batch["seq"].addressable_shards[0].data
    assert shard.shape == (2, 2, 8, 16, 16, 3), shard.shape

    mesh3 = make_mesh(8, sp_size=2, sph_size=2)
    put_batch3, _ = make_upload(mesh3)
    b3 = put_batch3({"seq": np.zeros((4, 2, 8, 16, 16, 3), np.uint8)})
    spec3 = b3["seq"].sharding.spec
    assert spec3[0] == "data" and spec3[2] == SP_AXIS, spec3
    shard3 = b3["seq"].addressable_shards[0].data
    assert shard3.shape == (2, 2, 4, 16, 16, 3), shard3.shape


def test_sph_classifier_train_jitter_triggered_equivalence():
    """Round-5 regression test for the H-sharded train-preprocess bug: the
    ColorJitter contrast mean is per-FRAME, so the round-4 H-sharded spec
    computed a chunk-local mean whenever jitter triggered — the earlier
    equivalence test passed only because its seeds never drew an apply.
    This test PROVES jitter triggers (same key arithmetic as _train_step)
    and still requires (data=2, sph=2) == (data=2)."""
    from coclr_tpu.config import EvalConfig
    from coclr_tpu.evalsuite.steps import (ClassifierState,
                                           make_classifier_steps)
    from coclr_tpu.models.classifier import LinearClassifier
    from coclr_tpu.parallel import make_mesh
    from coclr_tpu.parallel.mesh import sp_axis_of

    T, S, NC = 4, 16, 5
    cfg = EvalConfig(net="tiny", optim="sgd", wd=1e-3, dropout=0.5,
                     train_what="ft", compute_dtype="float32",
                     seq_len=T, img_dim=S, batch_size=2)

    # find an rng whose per-data-shard aug draws trigger jitter on BOTH
    # shards (replicating _train_step's fold: axis_index -> fold_in(.,0)
    # -> split -> k_jit -> eval_color_jitter_params' kp draw, p=0.3)
    def triggers(rng):
        hits = []
        for idx in range(2):  # data axis size 2
            r = jax.random.fold_in(rng, idx)
            rng_aug = jax.random.split(jax.random.fold_in(r, 0))[0]
            k_jit = jax.random.split(rng_aug)[0]
            kp = jax.random.split(k_jit, 6)[0]
            hits.append(bool(np.any(
                np.asarray(jax.random.uniform(kp, (2,))) < 0.3)))
        return all(hits)

    rng = next(jax.random.PRNGKey(s) for s in range(200)
               if triggers(jax.random.PRNGKey(s)))

    def build(mesh):
        model = LinearClassifier(
            num_class=NC, network="tiny", dropout=cfg.dropout,
            use_dropout=True, use_l2_norm=False, use_final_bn=False,
            dtype=jnp.float32, sp_axis=sp_axis_of(mesh))
        sample = jnp.zeros((1, T, S, S, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, sample, train=False)
        state = ClassifierState(params=variables["params"],
                                batch_stats=variables["batch_stats"],
                                step=jnp.zeros((), jnp.int32))
        tr, ev, tx = make_classifier_steps(model, cfg, mesh)
        return state, tr, tx

    s_dp, tr_dp, tx = build(make_mesh(2))
    s_sph, tr_sph, _ = build(make_mesh(4, sph_size=2))
    o_dp = jax.jit(tx.init)(s_dp.params)
    o_sph = jax.jit(tx.init)(s_sph.params)

    r = np.random.RandomState(11)
    batch = {"seq": jnp.asarray(
                 r.randint(0, 255, (4, T, S, S, 3)).astype(np.uint8)),
             "label": jnp.asarray(r.randint(0, NC, (4,)))}
    s_dp, o_dp, m_dp = tr_dp(s_dp, o_dp, batch, rng, jnp.float32(1e-2))
    s_sph, o_sph, m_sph = tr_sph(s_sph, o_sph, batch, rng, jnp.float32(1e-2))

    np.testing.assert_allclose(float(m_sph["loss"]), float(m_dp["loss"]),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_sph.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-5)


def test_sph_late_gather_s3d_train_48():
    """S3D at img 48 under sph=2: the local H chunk stops tiling at the
    block-4 pool (24 -> 12 -> 6 -> 3, odd), so the backbone all-gathers H
    there (seqpar.gather_h) and runs blocks 4-5 replicated. Train-mode
    forward + BN stats + pmean-combined grads must equal unsharded —
    pins the gather's psum_scatter transpose against the uniform-pmean
    grad combine (round 5; 48 is the cheapest gather-triggering size).

    tol 5e-5 (not the default 1e-5): pre-gather BN means reduce H as
    local-sum + psum vs the unsharded single sum; the re-associated f32
    accumulation drifts the deep blocks' running stats by a measured max
    of 1.8e-5 abs (23/256 elements of one 256-ch stat vector; values
    O(1e-4..1e-1)). A systematic sph-factor error would miss by O(value)
    everywhere, which stays excluded at 5e-5."""
    _encoder_equiv_sph("s3d", b=1, t=8, hw=48, mesh_shape=(2,),
                       sp_spec=SPAxes(h=SPH_AXIS), train=True, tol=5e-5)


def test_sph_late_gather_s3d_224():
    """img_dim 224 at sph=2 — the VERDICT-r4 case the old H%32 contract
    excluded: sharded through block 4 (H 112 -> 7 locally), gathered at
    the block-5 pool (global H=14 doesn't tile over 2 shards). Eval-mode
    forward + grads vs unsharded."""
    _encoder_equiv_sph("s3d", b=1, t=8, hw=224, mesh_shape=(2,),
                       sp_spec=SPAxes(h=SPH_AXIS), train=False)


def test_sph_late_gather_r50_48():
    """ResNet-2d3d-50 late gather: at img 48 / sph=2 the local H chunk
    runs 24 (stem) -> 12 (pool) -> 6 (layer2) -> 3, odd, so H is
    all-gathered before layer3's stride-2 block and layers 3-4 run
    sph-replicated (degrade_h in ResNet2d3d, round 5 — same fallback as
    S3D, lifting the old H%32 contract). Eval-mode forward + grads vs
    unsharded."""
    _encoder_equiv_sph("r50", b=1, t=8, hw=48, mesh_shape=(2,),
                       sp_spec=SPAxes(h=SPH_AXIS), train=False)


def test_sph_late_gather_sp_composition():
    """(sp=2, sph=2) with the late gather: T stays sharded after H is
    gathered (drop_h keeps the temporal axis), BN stats sync over both
    axes pre-gather and t-only post-gather. tol 5e-5: same re-associated
    f32 accumulation drift as test_sph_late_gather_s3d_train_48 (measured
    max 1.3e-5 abs on 1/576 elements in the standalone repro)."""
    _encoder_equiv_sph("s3d", b=1, t=16, hw=48, mesh_shape=(2, 2),
                       sp_spec=SPAxes(t=SP_AXIS, h=SPH_AXIS), train=True,
                       tol=5e-5)
