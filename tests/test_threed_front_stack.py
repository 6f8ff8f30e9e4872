"""Full 3D-FRONT stack: synthetic raw scene JSONs -> parse -> filter ->
encode (wocm / eval) -> collate; plus the cached boxes.npz path.

Exercises lsdm_tpu/data/threed_front_scene.py + threed_front_dataset.py
against the reference's contracts (atiss/scene_synthesis/datasets/)."""

import json
import os

import numpy as np
import pytest

from lsdm_tpu.data import threed_front_dataset as tfd
from lsdm_tpu.data import threed_front_scene as tfs
from lsdm_tpu.fitting.meshio import write_obj
from lsdm_tpu.ops.spiral import grid_mesh

#: raw 3D-FRONT categories -> generic bedroom labels used by the fixture
RAW_LABELS = ["king-size bed", "nightstand", "ceiling lamp"]


def _quat_about_y(theta):
    """3D-FRONT stores placement quaternions as (x, y, z, w); the reference's
    ``_transform`` reads ``rotation[1:]`` = (y, z, w) and recovers the y-axis
    angle from it (``threed_front_scene.py:161-174``)."""
    return [0.0, np.sin(theta / 2), 0.0, np.cos(theta / 2)]


@pytest.fixture()
def raw_front(tmp_path, rng):
    """Two scene JSONs with 2 rooms each, a model library, model_info."""
    models = tmp_path / "models"
    model_info = []
    v2, f = grid_mesh(3)
    # two stacked layers so the AABB has thickness in every axis
    v = np.concatenate([v2, v2 + np.array([0, 0, 0.3])])
    for i, lab in enumerate(RAW_LABELS):
        jid = f"jid{i}"
        os.makedirs(models / jid)
        write_obj(str(models / jid / "raw_model.obj"),
                  v * (0.4 + 0.2 * i), f)
        model_info.append({
            "model_id": jid, "super-category": "Bed / Frame",
            "category": lab, "style": "modern", "theme": None,
            "material": "wood",
        })
    (tmp_path / "model_info.json").write_text(json.dumps(model_info))

    scenes = tmp_path / "scenes"
    os.makedirs(scenes)
    floor_xyz = [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]]
    floor_faces = [0, 1, 2, 0, 2, 3]
    for s in range(2):
        furniture = [
            {"uid": f"u{i}", "jid": f"jid{i}", "valid": True}
            for i in range(3)
        ]
        mesh = [{
            "uid": f"m{s}", "jid": f"mj{s}",
            "xyz": sum(floor_xyz, []), "faces": floor_faces,
            "type": "Floor",
        }]
        rooms = []
        for r in range(2):
            children = [
                {"ref": f"u{i}",
                 "pos": [0.5 * i, 0.2, 0.3 * i],
                 "rot": _quat_about_y(0.3 * i),
                 "scale": [1.0, 1.0, 1.0]}
                for i in range(3)
            ] + [{"ref": f"m{s}", "pos": [0, 0, 0],
                  "rot": [0, 0, 0, 1], "scale": [1, 1, 1]}]
            rooms.append({
                "instanceid": f"room_{s}_{r}", "type": "Bedroom",
                "children": children,
            })
        (scenes / f"scene{s}.json").write_text(json.dumps({
            "furniture": furniture, "mesh": mesh,
            "scene": {"room": rooms},
        }))
    return tmp_path


def _parse(raw_front):
    return tfs.parse_threed_front_scenes(
        str(raw_front / "scenes"), str(raw_front / "model_info.json"),
        str(raw_front / "models"))


def test_placement_geometry_quirks():
    # the reference's cross([0,0,1], rot[1:]) read reduces to axis
    # (-z, y, 0) with angle 2*arccos(w); the x component is ignored
    axis, theta = tfs.placement_axis_angle([0.9, 0.5, 0.25, np.cos(0.4)])
    np.testing.assert_allclose(axis, [-0.25, 0.5, 0.0])
    np.testing.assert_allclose(theta, 0.8)

    # wrap to (-pi, pi] with the sign of the y component
    angles = tfs.placement_y_angles(np.array([
        _quat_about_y(0.3),
        _quat_about_y(-0.7),
        _quat_about_y(4.0),         # theta >= pi wraps negative
        [0.0, 0.0, 0.0, 1.0],       # identity -> 0
        [0.0, 0.3, 0.0, 1.0 + 1e-9],  # |w| > 1 -> NaN theta -> 0
    ]))
    np.testing.assert_allclose(
        angles, [0.3, -0.7, 4.0 - 2 * np.pi, 0.0, 0.0], atol=1e-6)

    # non-y rotations are rejected like the reference's assert
    with pytest.raises(ValueError):
        tfs.placement_y_angles(np.array([[0.0, 0.2, 0.3, 0.9]]))


def test_rodrigues_matches_quaternion_matrix(rng):
    """Rodrigues formulation == the reference's expanded quaternion-product
    matrix (threed_front_scene.py:36-46), here re-derived as the oracle."""
    for _ in range(5):
        axis = rng.randn(3)
        theta = rng.uniform(-np.pi, np.pi)
        a = np.cos(theta / 2.0)
        b, c, d = -(axis / np.linalg.norm(axis)) * np.sin(theta / 2.0)
        oracle = np.array([
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d),
             2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d,
             2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b),
             a * a + d * d - b * b - c * c],
        ])
        np.testing.assert_allclose(
            tfs.rotation_about(axis, theta), oracle, atol=1e-12)


def test_parse_and_raw_dataset(raw_front):
    rooms = _parse(raw_front)
    assert len(rooms) == 4  # 2 scenes x 2 rooms, unique instanceids
    room = rooms[0]
    assert room.scene_type == "bedroom"
    assert room.nobjects == 3
    # z-angle recovered from the placement quaternion
    np.testing.assert_allclose(
        [b.z_angle for b in room.bboxes], [0.0, 0.3, 0.6], atol=1e-6)
    # floor plan concatenation + centroid
    v, f = room.floor_plan
    assert v.shape == (4, 3) and f.shape == (2, 3)
    np.testing.assert_allclose(room.floor_plan_centroid, [0, 0, 0], atol=1e-6)
    # closed-form size == the reference's corner-distance formulation
    for b in room.bboxes:
        c = b.corners()
        corner_size = np.array([
            np.linalg.norm(c[4] - c[0]) / 2,
            np.linalg.norm(c[2] - c[0]) / 2,
            np.linalg.norm(c[1] - c[0]) / 2,
        ])
        np.testing.assert_allclose(b.size, corner_size, atol=1e-9)
        assert np.all(b.size > 0)
    # centroid == mean of transformed corners
    np.testing.assert_allclose(
        room.bboxes[1].centroid(), room.bboxes[1].corners().mean(0),
        atol=1e-9)

    ds = tfd.ThreedFront(rooms)
    assert ds.n_object_types == 3
    assert ds.class_labels[-2:] == ["start", "end"]
    bounds = ds.bounds
    assert set(bounds) == {"translations", "sizes", "angles"}
    freqs = ds.class_frequencies
    np.testing.assert_allclose(sum(freqs.values()), 1.0)


def test_filters_and_encoding_chain(raw_front):
    rooms = _parse(raw_front)
    filter_fn = tfd.compose_filters(
        tfd.room_type_contains("bed"),
        tfd.at_least_boxes(2),
        tfd.at_most_boxes(13),
        tfd.contains_any_label(["king-size bed"]),
    )
    ds = tfd.ThreedFront([s for s in map(filter_fn, rooms) if s])
    assert len(ds) == 4

    np.random.seed(0)
    enc = tfd.dataset_encoding_factory("autoregressive_wocm", ds)
    sample = enc[0]
    # context boxes + single *_tr target row per property
    assert sample["class_labels"].shape[1] == ds.n_classes
    assert sample["class_labels_tr"].shape == (ds.n_classes,)
    assert sample["translations_tr"].shape == (3,)
    assert sample["length"] == sample["class_labels"].shape[0]
    # scaled into [-1, 1]
    assert np.all(sample["translations"] >= -1) and np.all(
        sample["translations"] <= 1)

    batch = enc.collate_fn([enc[0], enc[1], enc[2]])
    assert batch["class_labels"].shape[0] == 3
    assert batch["class_labels_tr"].shape[1] == 1  # singleton box axis
    assert batch["lengths"].shape == (3,)

    ev = tfd.dataset_encoding_factory("eval", ds)
    s = ev[0]
    assert s["class_labels"].shape[0] == 3  # all boxes, no split
    # rooms without a mask render get the constant fallback layout
    assert s["room_layout"].shape == (1, tfd.DEFAULT_LAYOUT_SIZE,
                                      tfd.DEFAULT_LAYOUT_SIZE)
    # post_process descales back to metric units
    restored = ev.post_process(
        {"translations": s["translations"], "class_labels": s["class_labels"]})
    lo, hi = ds.bounds["translations"]
    assert np.all(restored["translations"] >= lo - 1e-5)
    assert np.all(restored["translations"] <= hi + 1e-5)


def test_filter_function_spec_table(raw_front):
    """The bedroom filter chain end-to-end: vocabulary gate, relabeling,
    invalid-id and split filtering, lamp removal."""
    (raw_front / "invalid_scenes.txt").write_text("room_1_1\n")
    (raw_front / "invalid_jids.txt").write_text("not_a_real_jid\n")
    (raw_front / "splits.csv").write_text(
        "room_0_0,train\nroom_0_1,train\nroom_1_0,val\nroom_1_1,train\n")
    config = {
        "filter_fn": "threed_front_bedroom",
        "path_to_invalid_scene_ids": str(raw_front / "invalid_scenes.txt"),
        "path_to_invalid_bbox_jids": str(raw_front / "invalid_jids.txt"),
        "annotation_file": str(raw_front / "splits.csv"),
    }
    fn = tfd.filter_function(config, split=["train"], without_lamps=True)
    kept = [s for s in map(fn, _parse(raw_front)) if s]
    # train split minus the invalid scene id
    assert sorted(r.scene_id for r in kept) == ["room_0_0", "room_0_1"]
    # raw categories remapped to the generic vocabulary, lamp dropped
    assert all(r.furniture_in_room == ["double_bed", "nightstand"]
               for r in kept)

    # trivial modes
    assert tfd.filter_function({"filter_fn": "no_filtering"})("x") == "x"
    assert tfd.filter_function({"filter_fn": "non_empty"})(kept[0]) is kept[0]


def test_future_models_and_retrieval_augment(raw_front):
    models = tfs.parse_threed_future_models(
        str(raw_front / "scenes"), str(raw_front / "models"),
        str(raw_front / "model_info.json"))
    assert sorted(m.uid for m in models) == ["u0", "u1", "u2"]  # unique uids

    from lsdm_tpu.data.threed_front import ThreedFutureDataset

    library = ThreedFutureDataset(models)
    room = _parse(raw_front)[0]
    np.random.seed(3)
    augmented = room.augment_room(library)
    assert augmented.scene_id == room.scene_id + "_augm"
    assert augmented.nobjects == room.nobjects
    assert sorted(augmented.furniture_in_room) == sorted(
        room.furniture_in_room)


def test_rotation_augmentation_and_jitter(raw_front):
    ds = tfd.ThreedFront(_parse(raw_front))
    base = tfd.raw_room_sample(ds)(0)
    np.random.seed(5)  # first rand() < 0.5 draw decides; rotate when it hits
    rotated = tfd.rotation_augmented(ds.bounds)(
        {k: np.copy(v) for k, v in base.items()})
    # rotation preserves distances from the room origin
    np.testing.assert_allclose(
        np.linalg.norm(rotated["translations"], axis=-1),
        np.linalg.norm(base["translations"], axis=-1), atol=1e-5)
    lo = ds.bounds["angles"][0]
    assert np.all(rotated["angles"] >= lo)
    assert np.all(rotated["angles"] < lo + 2 * np.pi)

    jit = tfd.jittered()({k: np.copy(v) for k, v in base.items()})
    # reference quirk: ONE scalar draw per property, added uniformly
    delta = jit["translations"] - base["translations"]
    np.testing.assert_allclose(delta, delta.flat[0], atol=1e-6)
    np.testing.assert_allclose(jit["class_labels"], base["class_labels"])


def test_scene_pickle_cache(raw_front, tmp_path):
    cache = str(tmp_path / "scenes.pkl")
    first = tfs.parse_threed_front_scenes(
        str(raw_front / "scenes"), str(raw_front / "model_info.json"),
        str(raw_front / "models"), cache_path=cache)
    assert os.path.exists(cache)
    again = tfs.parse_threed_front_scenes(
        "/nonexistent", "", "", cache_path=cache)  # served from the pickle
    assert len(again) == len(first)
    assert again[0].scene_id == first[0].scene_id


def test_cached_rooms_path(tmp_path, rng):
    base = tmp_path / "cache"
    C = 5
    stats = {
        "bounds_translations": [-2, -1, -2, 2, 1, 2],
        "bounds_sizes": [0.01, 0.01, 0.01, 2, 2, 2],
        "bounds_angles": [-np.pi, np.pi],
        "class_labels": [f"c{i}" for i in range(C - 2)] + ["start", "end"],
        "object_types": [f"c{i}" for i in range(C - 2)],
        "class_frequencies": {f"c{i}": 1 / (C - 2) for i in range(C - 2)},
        "class_order": {f"c{i}": i for i in range(C - 2)},
        "count_furniture": {f"c{i}": 10 for i in range(C - 2)},
    }
    ids = []
    for i in range(3):
        tag = f"Bedroom_{i:03d}"
        ids.append(f"{i:03d}")
        os.makedirs(base / tag)
        L = 3 + i
        np.savez(
            base / tag / "boxes.npz",
            scene_id=tag,
            room_layout=(rng.rand(64, 64, 1) * 255).astype(np.uint8),
            floor_plan_vertices=rng.rand(4, 3),
            floor_plan_faces=np.array([[0, 1, 2], [0, 2, 3]]),
            floor_plan_centroid=np.zeros(3),
            class_labels=np.eye(C)[rng.randint(0, C - 2, L)].astype(
                np.float32),
            translations=rng.randn(L, 3).astype(np.float32),
            sizes=rng.rand(L, 3).astype(np.float32),
            angles=rng.randn(L, 1).astype(np.float32),
        )
    (base / "stats.json").write_text(json.dumps(stats))
    split_csv = tmp_path / "splits.csv"
    split_csv.write_text("000,train\n001,train\n002,test\n")

    config = {
        "dataset_type": "cached_threedfront",
        "encoding_type": "cached_autoregressive_wocm",
        "dataset_directory": str(base),
        "annotation_file": str(split_csv),
        "train_stats": "stats.json",
        "room_layout_size": "32,32",
    }
    np.random.seed(1)
    raw, enc = tfd.get_dataset_raw_and_encoded(config, split=["train"])
    assert len(raw) == 2  # split filtering
    room = raw[0]
    assert room.room_mask.shape == (32, 32, 1)
    params = raw.get_room_params(0)
    assert params["room_layout"].shape == (1, 32, 32)

    sample = enc[0]
    assert sample["class_labels_tr"].shape == (C,)
    batch = enc.collate_fn([enc[0], enc[1]])
    assert batch["room_layout"].shape == (2, 1, 32, 32)
    # bounds come from train_stats
    lo, hi = raw.bounds["translations"]
    np.testing.assert_allclose(lo, [-2, -1, -2])

    # class-frequency box ordering on the cached path
    enc2 = tfd.get_encoded_dataset(
        {**config, "box_ordering": "class_frequencies"}, split=["train"])
    s2 = enc2[0]
    assert s2["class_labels"].shape[1] == C
