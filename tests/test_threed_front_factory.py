"""Tests: 3D-FUTURE dataset, cached 3D-FRONT samples, factory, guidance,
bpd loop, load_scene_data."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lsdm_tpu.data.threed_front import (
    CachedThreedFront, FurnitureModel, ThreedFutureDataset, build_splits,
)
from lsdm_tpu.diffusion import make_schedule
from lsdm_tpu.diffusion.gaussian import (
    DenoiserOutput, calc_bpd_loop, condition_mean, condition_score,
)
from lsdm_tpu.diffusion.sampler import p_sample_step
from lsdm_tpu.factory import create_model_and_diffusion
from lsdm_tpu.fitting.meshio import write_obj
from lsdm_tpu.ops.geometry import load_scene_data
from lsdm_tpu.ops.spiral import grid_mesh


def test_threed_future_retrieval(tmp_path):
    v, f = grid_mesh(3)
    os.makedirs(tmp_path / "table" / "t1")
    os.makedirs(tmp_path / "chair")
    write_obj(str(tmp_path / "table" / "t1" / "raw_model.obj"), v * 2, f)
    write_obj(str(tmp_path / "chair" / "c1.obj"), v, f)
    ds = ThreedFutureDataset.from_directory(str(tmp_path))
    assert len(ds) == 2
    best = ds.get_closest_furniture_to_box("table", np.array([1.0, 1.0, 0.0]))
    assert best.model_jid == "t1"
    assert ds.get_closest_furniture_to_box("sofa", np.zeros(3)) is None


def test_build_splits(tmp_path):
    p = tmp_path / "splits.csv"
    p.write_text("room1,train\nroom2,test\nroom3,train\n")
    s = build_splits(str(p))
    assert s["train"] == ["room1", "room3"]
    assert s["test"] == ["room2"]


def test_cached_threed_front(tmp_path, rng):
    for sid in ("roomA", "roomB"):
        os.makedirs(tmp_path / sid)
        L = 5
        np.savez(
            tmp_path / sid / "boxes.npz",
            class_labels=np.eye(7, dtype=np.float32)[rng.randint(0, 7, L)],
            translations=rng.randn(L, 3).astype(np.float32),
            sizes=rng.rand(L, 3).astype(np.float32),
            angles=rng.randn(L, 1).astype(np.float32),
        )
    ds = CachedThreedFront(str(tmp_path), max_boxes=8)
    assert len(ds) == 2
    item = ds[0]
    assert item["class_labels"].shape == (8, 7)
    assert item["class_labels_tr"].shape == (1, 7)
    assert item["room_layout"].shape == (1, 64, 64)
    assert item["valid_mask"].sum() <= 5
    batch = ds.collate([0, 1])
    assert batch["translations"].shape == (2, 8, 3)


def test_factory_presets():
    model, sched = create_model_and_diffusion("proxd")
    assert model.cfg.max_cats == 13
    assert sched.num_timesteps == 1000
    model_h, _ = create_model_and_diffusion("humanise", pcd_points=64)
    assert model_h.cfg.max_cats == 11
    assert model_h.cfg.pcd_points == 64


def test_classifier_guidance_shifts_sample():
    sched = make_schedule("cosine", 10)
    x0 = jnp.zeros((1, 8, 3))

    def model_fn(x_t, t):
        return DenoiserOutput(x0=x0, cat=jnp.zeros((1, 1, 13)))

    def cond_fn(x, t):
        return jnp.ones_like(x) * 100.0  # strong constant gradient

    x = jnp.zeros((1, 8, 3))
    t = jnp.asarray([5], jnp.int32)
    s0, _, _ = p_sample_step(sched, model_fn, x, t, jax.random.PRNGKey(0))
    s1, _, _ = p_sample_step(sched, model_fn, x, t, jax.random.PRNGKey(0),
                             cond_fn=cond_fn)
    assert float(jnp.mean(s1 - s0)) > 0  # guidance pushed the mean up


def test_condition_score_changes_x0():
    sched = make_schedule("cosine", 10)
    x = jnp.ones((1, 8, 3))
    t = jnp.asarray([5], jnp.int32)
    pred = jnp.zeros((1, 8, 3))
    out = condition_score(lambda x, t: jnp.ones_like(x), sched, pred, x, t)
    assert float(jnp.abs(out - pred).sum()) > 0


def test_calc_bpd_loop():
    sched = make_schedule("cosine", 6)
    x0 = jnp.zeros((2, 8, 3))

    def model_fn(x_t, t):
        return DenoiserOutput(x0=jnp.zeros_like(x_t), cat=jnp.zeros((2, 1, 13)))

    out = calc_bpd_loop(sched, model_fn, x0, jax.random.PRNGKey(0))
    assert out["total_bpd"].shape == (2,)
    assert out["vb"].shape == (2, 6)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # perfect model on zeros: total bpd dominated by decoder/prior, small
    assert (np.asarray(out["total_bpd"]) >= 0).all()


def test_load_scene_data(tmp_path, rng):
    dim = 8
    meta = {"dim": dim, "min": [0, 0, 0], "max": [1, 1, 1], "badding_val": 0.1,
            "bbox": [[0, 0, 0], [1, 1, 1]]}
    (tmp_path / "scene.json").write_text(json.dumps(meta))
    np.save(tmp_path / "scene_sdf.npy", rng.randn(dim**3).astype(np.float32))
    sem = np.zeros(dim**3, np.float32)
    sem[:10] = 34  # remapped to 10
    sem[10:20] = 25  # remapped to 28
    np.save(tmp_path / "scene_semantics.npy", sem)
    out = load_scene_data("scene", str(tmp_path), use_semantics=True)
    assert out["sdf"].shape == (dim, dim, dim)
    assert 34 not in np.unique(out["semantics"])
    assert 10 in np.unique(out["semantics"]) and 28 in np.unique(out["semantics"])
    assert out["scene_semantics"][0, 10] == 1
