"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.diffusion import make_schedule
from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.parallel import mesh as mesh_lib
from lsdm_tpu.train.state import create_train_state, make_optimizer
from lsdm_tpu.train.trainer import make_train_step

TINY = SDMConfig(
    clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24, pcd_points=32,
)
B, O, N = 8, 9, 32


def _batch(key):
    ks = jax.random.split(key, 4)
    target = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    target_cat = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 13)
    return mask, objs, cats, target, target_cat, text


def test_mesh_construction():
    assert jax.device_count() == 8
    m = mesh_lib.make_mesh((4, 2))
    assert m.shape == {"data": 4, "model": 2}
    m1 = mesh_lib.make_mesh()
    assert m1.shape == {"data": 8, "model": 1}
    with pytest.raises(AssertionError):
        mesh_lib.make_mesh((3, 2))


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_train_step(shape):
    mesh = mesh_lib.make_mesh(shape)
    model = SceneDiffusionModel(TINY, obj_sharding=mesh_lib.obj_sharding(mesh))
    schedule = make_schedule("cosine", 8)
    tx = make_optimizer()
    mask, objs, cats, target, target_cat, text = _batch(jax.random.PRNGKey(0))
    variables = model.init(
        jax.random.PRNGKey(1), target, mask, jnp.zeros((B,), jnp.int32), objs,
        cats, text,
    )
    state = jax.device_put(
        create_train_state(variables, tx), mesh_lib.replicated(mesh)
    )
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    step = make_train_step(model, schedule, tx)
    new_state, metrics = step(
        state, put(mask), put(objs), put(cats), put(target), put(target_cat),
        put(text), jax.random.PRNGKey(2),
    )
    jax.block_until_ready(new_state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params stay replicated (fully-addressable, same on all devices)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_chunked_train_step():
    """The scanned K-steps-per-dispatch program composes with the (4,2)
    mesh: stacked batches sharded on axis 1 (data), replicated donated
    state, finite metrics for every scanned step."""
    from lsdm_tpu.train.trainer import make_scan_train_step

    K = 2
    mesh = mesh_lib.make_mesh((4, 2))
    model = SceneDiffusionModel(TINY, obj_sharding=mesh_lib.obj_sharding(mesh))
    schedule = make_schedule("cosine", 8)
    tx = make_optimizer()
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(K)]
    mask, objs, cats, target, target_cat, text = batches[0]
    variables = model.init(
        jax.random.PRNGKey(1), target, mask, jnp.zeros((B,), jnp.int32), objs,
        cats, text,
    )
    state = jax.device_put(
        create_train_state(variables, tx), mesh_lib.replicated(mesh)
    )
    stacked = tuple(jnp.stack(xs) for xs in zip(*batches))
    put = lambda a: jax.device_put(
        a, mesh_lib.stacked_batch_sharding(mesh, a.ndim)
    )
    scan_step = make_scan_train_step(model, schedule, tx)
    new_state, metrics = scan_step(
        state, *(put(a) for a in stacked), jax.random.PRNGKey(2),
        jnp.arange(K, dtype=jnp.uint32),
    )
    jax.block_until_ready(new_state)
    assert metrics["loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(new_state.step) == K
    assert jax.tree.leaves(new_state.params)[0].sharding.is_fully_replicated


def test_sharded_equals_single_device():
    """The 4x2-sharded step computes the same update as single-device."""
    model1 = SceneDiffusionModel(TINY)
    schedule = make_schedule("cosine", 8)
    tx = make_optimizer()
    mask, objs, cats, target, target_cat, text = _batch(jax.random.PRNGKey(0))
    variables = model1.init(
        jax.random.PRNGKey(1), target, mask, jnp.zeros((B,), jnp.int32), objs,
        cats, text,
    )
    # the train step donates its state; keep an unshared copy for run 2
    variables2 = jax.tree.map(jnp.copy, variables)
    state1 = create_train_state(variables, tx)
    step1 = make_train_step(model1, schedule, tx)
    s1, m1 = step1(state1, mask, objs, cats, target, target_cat, text,
                   jax.random.PRNGKey(2))

    mesh = mesh_lib.make_mesh((4, 2))
    model2 = SceneDiffusionModel(TINY, obj_sharding=mesh_lib.obj_sharding(mesh))
    state2 = jax.device_put(
        create_train_state(variables2, tx), mesh_lib.replicated(mesh)
    )
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    step2 = make_train_step(model2, schedule, tx)
    s2, m2 = step2(state2, put(mask), put(objs), put(cats), put(target),
                   put(target_cat), put(text), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_sharded_sampling_equals_single_device():
    """Full scanned sampling with the batch dp-sharded over the mesh matches
    the single-device result (inference-path analogue of the sharded train
    step tests; SURVEY.md section 2.10)."""
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sampling import sample_sdm
    from lsdm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = TINY
    model = SceneDiffusionModel(cfg)
    B, O, N = 8, cfg.max_objs, cfg.pcd_points
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    mask = jnp.zeros((B, O)).at[:, 1:3].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jnp.zeros((B, O), jnp.int32), 13)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))
    x0 = jax.random.normal(ks[0], (B, N, 3))
    variables = model.init(ks[4], x0, mask, jnp.zeros((B,), jnp.int32), objs,
                           cats, text)
    sched = make_schedule("cosine", 8)

    def run(m, o, c, t):
        s, last = sample_sdm(model, variables, sched, m, o, c, t,
                             jax.random.PRNGKey(11), clip_denoised=False)
        return s, last.cat

    single, single_cat = jax.jit(run)(mask, objs, cats, text)

    mesh = make_mesh((8, 1))
    with mesh:
        sm, so, sc, st = shard_batch(mesh, (mask, objs, cats, text))
        sharded, sharded_cat = jax.jit(run)(sm, so, sc, st)

    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sharded_cat), np.asarray(single_cat),
                               atol=2e-5)


def test_midsize_partitioning_no_giant_allgather(monkeypatch):
    """Partitioning regression pin (VERDICT r02 items 3/weak-2): the sharded
    train step at a mid-size config (256-point clouds, real architecture
    proportions) must not re-replicate the (B*O, S, N) ball-query tensors.
    lax.top_k used to force a full all-gather + redundant sort per device
    (302 MB at full size); the prefix-count formulation partitions.  Full-
    size (1024-pt) evidence: `python __graft_entry__.py --full --report`
    (PERF.md)."""
    import re

    # gather_bwd="matmul": the G-chunked one-hot backward must also
    # partition (its lax.scan chunks the gather axis, never the sharded
    # batch axis — ops/pointcloud.py:_index_points_mm_bwd); the "scatter"
    # default is covered by the driver's dryrun_multichip every round.
    cfg = SDMConfig(clip_dim=64, latent_dim=64, cat_emb=16, n_head=4,
                    vert_dims=128, pcd_points=256, gather_bwd="matmul")
    # shrink the one-hot transient budget so sa1's G=8192 takes the
    # chunked-scan branch in this compile, as full size does
    from lsdm_tpu.ops import pointcloud as pc
    monkeypatch.setattr(pc, "ONEHOT_TRANSIENT_CAP_BYTES",
                        72 * cfg.pcd_points * 2 * 2048)
    mesh = mesh_lib.make_mesh((4, 2))
    model = SceneDiffusionModel(cfg, obj_sharding=mesh_lib.obj_sharding(mesh))
    schedule = make_schedule("cosine", 8)
    tx = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Bm, Nm = 8, cfg.pcd_points
    target = jax.random.normal(ks[0], (Bm, Nm, 3))
    mask = jnp.zeros((Bm, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (Bm, O, Nm, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (Bm, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (Bm, cfg.clip_dim))
    target_cat = jax.nn.one_hot(jnp.zeros((Bm,), jnp.int32), 13)
    variables = model.init(jax.random.PRNGKey(1), target, mask,
                           jnp.zeros((Bm,), jnp.int32), objs, cats, text)
    state = jax.device_put(create_train_state(variables, tx),
                           mesh_lib.replicated(mesh))
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    step = make_train_step(model, schedule, tx)
    args = (state, put(mask), put(objs), put(cats), put(target),
            put(target_cat), put(text), jax.random.PRNGKey(2))
    compiled = step.lower(*args).compile()
    worst = 0
    for m in re.finditer(r"all-gather[^\n]*?= \w+\[([\d,]+)\]",
                         compiled.as_text()):
        size = 4 * int(np.prod([int(d) for d in m.group(1).split(",")]))
        worst = max(worst, size)
    # B*O x S x N fp32 at this config would be 18 MB; the biggest legitimate
    # all-gather (sp un-shard of backbone outputs) is well under 2 MB
    assert worst < 8e6, f"giant all-gather reappeared: {worst / 1e6:.0f} MB"
    new_state, metrics = step(*args)
    assert np.isfinite(float(metrics["loss"]))


def test_midsize_sampling_partitioning_no_giant_allgather():
    """Eval-path analogue of the train-step pin above (VERDICT r03 item 6):
    the scanned sampler with the object axis sharded must partition cleanly.
    Two things are under test: (a) the ``select_impl`` flip at
    models/sdm.py:116-136 picks the partition-clean topk_p/spmd neighbour
    selection exactly when ``obj_sharding`` is set, and (b) a config asking
    for the FUSED eval kernels (which have no SPMD rule and would force
    replication) falls back to the composed formulations under sharding —
    so the cfg here deliberately sets ball_impl="fused"."""
    import re

    from lsdm_tpu.models.sampling import sample_sdm

    cfg = SDMConfig(clip_dim=64, latent_dim=64, cat_emb=16, n_head=4,
                    vert_dims=128, pcd_points=256, ball_impl="fused")
    mesh = mesh_lib.make_mesh((4, 2))
    model = SceneDiffusionModel(cfg, obj_sharding=mesh_lib.obj_sharding(mesh))
    schedule = make_schedule("cosine", 8)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Bm, Nm = 8, cfg.pcd_points
    mask = jnp.zeros((Bm, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (Bm, O, Nm, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (Bm, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (Bm, cfg.clip_dim))
    variables = model.init(jax.random.PRNGKey(1),
                           jax.random.normal(ks[0], (Bm, Nm, 3)), mask,
                           jnp.zeros((Bm,), jnp.int32), objs, cats, text)
    variables = jax.device_put(variables, mesh_lib.replicated(mesh))
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))

    def run(m, o, c, t):
        s, last = sample_sdm(model, variables, schedule, m, o, c, t,
                             jax.random.PRNGKey(11), clip_denoised=False)
        return s, last.cat

    args = (put(mask), put(objs), put(cats), put(text))
    compiled = jax.jit(run).lower(*args).compile()
    worst = 0
    for m in re.finditer(r"all-gather[^\n]*?= \w+\[([\d,]+)\]",
                         compiled.as_text()):
        size = 4 * int(np.prod([int(d) for d in m.group(1).split(",")]))
        worst = max(worst, size)
    # the (B*O, S, N) fp32 distance tensor at this config is 18.9 MB; the
    # legitimate all-gathers (un-shard of backbone outputs) are KB-scale
    assert worst < 8e6, f"giant all-gather in the sampler: {worst / 1e6:.0f} MB"
    s, cat = compiled(*args)
    assert np.isfinite(np.asarray(s)).all()


@pytest.mark.parametrize("impl", ["fused", "pallas", "sg"])
def test_sharded_context_overrides_kernel_ball_impls(impl):
    """The Pallas kernels have no GSPMD partitioning rule — a sharded
    object axis must keep them off the GSPMD partitioner.  Round 4: all
    fell back to the composed partition-clean formulations.  Round 5:
    the per-cloud "pallas" selection kernels instead pass through WITH
    the shard handle and run under shard_map (zero collectives,
    models/pointnet2.py); "fused"/"sg" still remap to composed."""
    import dataclasses

    cfg = dataclasses.replace(TINY, ball_impl=impl)
    mesh = mesh_lib.make_mesh((4, 2))
    sh = mesh_lib.obj_sharding(mesh)
    sharded = SceneDiffusionModel(cfg, obj_sharding=sh)
    mask, objs, cats, target, _, text = _batch(jax.random.PRNGKey(0))
    variables = sharded.init(jax.random.PRNGKey(1), target, mask,
                             jnp.zeros((B,), jnp.int32), objs, cats, text)
    bb = sharded.bind(variables).pcd_backbone
    if impl == "pallas":
        assert bb.ball_impl == "pallas" and bb.shard is sh
    else:
        assert bb.ball_impl == "auto"
    # and without sharding the requested impl passes through, no shard
    plain = SceneDiffusionModel(cfg)
    assert plain.bind(variables).pcd_backbone.ball_impl == impl
    assert plain.bind(variables).pcd_backbone.shard is None


def test_sharded_train_attention_kernel_matches_composed():
    """Round 5: with a sharded object axis, attn_impl='pallas' now runs
    the fused rank-1 train kernel under shard_map (per-shard, zero
    collectives) instead of falling back to composed.  The sharded-
    kernel step must produce the same loss and grads as the sharded
    COMPOSED step (the kernel is bf16-grade-exact at fp32)."""
    import dataclasses

    mesh = mesh_lib.make_mesh((4, 2))
    sh = mesh_lib.obj_sharding(mesh)
    # B*O = 72 divides the 8 shards; N=32 satisfies the kernel's L%8
    cfg_k = dataclasses.replace(TINY, attn_impl="pallas")
    m_k = SceneDiffusionModel(cfg_k, obj_sharding=sh)
    m_c = SceneDiffusionModel(TINY, obj_sharding=sh)
    schedule = make_schedule("cosine", 8)
    mask, objs, cats, target, target_cat, text = _batch(jax.random.PRNGKey(0))
    variables = m_c.init(
        jax.random.PRNGKey(1), target, mask, jnp.zeros((B,), jnp.int32),
        objs, cats, text)
    tx = make_optimizer()
    # the train step DONATES the state: give each step its own buffers
    mk_state = lambda: jax.device_put(
        jax.tree.map(jnp.copy, create_train_state(variables, tx)),
        mesh_lib.replicated(mesh))
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    args = (put(mask), put(objs), put(cats), put(target), put(target_cat),
            put(text), jax.random.PRNGKey(2))
    s_k, met_k = make_train_step(m_k, schedule, tx)(mk_state(), *args)
    s_c, met_c = make_train_step(m_c, schedule, tx)(mk_state(), *args)
    np.testing.assert_allclose(float(met_k["loss"]), float(met_c["loss"]),
                               rtol=2e-4)
    lk = jax.tree.leaves(s_k.params)
    lc = jax.tree.leaves(s_c.params)
    deltas = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(lk, lc)]
    assert max(deltas) < 2e-3, f"param update divergence {max(deltas)}"
    # the kernel path kept params replicated and the step finite
    assert np.isfinite(float(met_k["loss"]))
    assert lk[0].sharding.is_fully_replicated


def test_sharded_selection_kernels_match_composed():
    """Round 5: ball_impl='pallas' under a sharded object axis runs the
    selection kernels (ball query, 3-NN, FPS) per-shard via shard_map.
    The selection is bit-identical to the composed formulations, so the
    sharded-kernel train step must match the sharded composed step."""
    import dataclasses

    mesh = mesh_lib.make_mesh((4, 2))
    sh = mesh_lib.obj_sharding(mesh)
    cfg_k = dataclasses.replace(TINY, ball_impl="pallas")
    m_k = SceneDiffusionModel(cfg_k, obj_sharding=sh)
    m_c = SceneDiffusionModel(TINY, obj_sharding=sh)  # auto -> topk_p
    schedule = make_schedule("cosine", 8)
    mask, objs, cats, target, target_cat, text = _batch(jax.random.PRNGKey(0))
    variables = m_c.init(
        jax.random.PRNGKey(1), target, mask, jnp.zeros((B,), jnp.int32),
        objs, cats, text)
    tx = make_optimizer()
    mk_state = lambda: jax.device_put(
        jax.tree.map(jnp.copy, create_train_state(variables, tx)),
        mesh_lib.replicated(mesh))
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    args = (put(mask), put(objs), put(cats), put(target), put(target_cat),
            put(text), jax.random.PRNGKey(2))
    s_k, met_k = make_train_step(m_k, schedule, tx)(mk_state(), *args)
    s_c, met_c = make_train_step(m_c, schedule, tx)(mk_state(), *args)
    np.testing.assert_allclose(float(met_k["loss"]), float(met_c["loss"]),
                               rtol=2e-4)
    deltas = [float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(s_k.params),
                              jax.tree.leaves(s_c.params))]
    assert max(deltas) < 2e-3, f"param update divergence {max(deltas)}"
    assert np.isfinite(float(met_k["loss"]))
