"""3D-FRONT scene objects: furniture models, room meshes, scene graphs.

Full rebuild of the reference's scene layer
(``atiss/scene_synthesis/datasets/threed_front_scene.py`` and the parsing
half of ``datasets/utils.py``), host-side numpy only:

  * :func:`rotation_matrix` — axis-angle rotation (3D-Front-Toolbox math,
    ``threed_front_scene.py:36-46``);
  * :class:`Asset` / :class:`ModelInfo` — 3D-FUTURE model metadata
    (:49-150);
  * :class:`ThreedFutureModel` — a placed furniture instance: quaternion ->
    z-angle extraction, transformed bounding-box corners, half-extent sizes
    (:204-394);
  * :class:`ThreedFutureExtra` — walls/floors/doors carried as raw meshes
    (:397-423);
  * :class:`Room` — a scene with furniture + extras: floor plans, bboxes,
    centroid-ordered box lists, retrieval-augmentation (:426-641);
  * :func:`parse_threed_front_scenes` / :func:`parse_threed_future_models`
    — the raw 3D-FRONT JSON ingestion (``datasets/utils.py:19-204``).

Deviations from the reference (documented, deliberate):
  * mesh IO goes through :func:`lsdm_tpu.ops.spiral.load_obj` instead of
    trimesh, and mesh accessors return ``(vertices, faces)`` numpy tuples
    instead of trimesh/simple_3dviz objects;
  * the GUI rendering surface (``show``/``*_renderable``; simple_3dviz) is
    out of scope in this headless environment — `vis_fitting_results`
    covers headless export;
  * parsed scenes/furniture pickles are written next to the dataset (or a
    caller-supplied path), not hardcoded ``/tmp`` (``utils.py:129,202``).
"""

from __future__ import annotations

import json
import os
import pickle
from collections import Counter, defaultdict
from dataclasses import dataclass
from functools import lru_cache, reduce
from typing import List, Optional, Sequence

import numpy as np

from lsdm_tpu.ops.spiral import load_obj


def rotation_matrix(axis, theta: float) -> np.ndarray:
    """Axis-angle rotation matrix (``threed_front_scene.py:36-46``)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.sqrt(np.dot(axis, axis))
    a = np.cos(theta / 2.0)
    b, c, d = -axis * np.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array([
        [aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
        [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
        [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc],
    ])


@dataclass
class Asset:
    """Metadata of one 3D-FUTURE model (``threed_front_scene.py:49-60``)."""

    super_category: str
    category: str
    style: str
    theme: str
    material: str

    @property
    def label(self) -> str:
        return self.category


class ModelInfo:
    """All 3D-FUTURE model metadata (``threed_front_scene.py:63-150``)."""

    def __init__(self, model_info_data: Sequence[dict]):
        self.model_info_data = model_info_data
        self._model_info = None
        self._styles: List[str] = []
        self._themes: List[str] = []
        self._categories: List[str] = []
        self._super_categories: List[str] = []
        self._materials: List[str] = []

    @property
    def model_info(self):
        if self._model_info is None:
            self._model_info = {}
            for m in self.model_info_data:
                for field, bucket in (
                    ("style", self._styles), ("theme", self._themes),
                    ("super-category", self._super_categories),
                    ("category", self._categories),
                    ("material", self._materials),
                ):
                    if m.get(field) is not None and m[field] not in bucket:
                        bucket.append(m[field])
                super_cat = "unknown_super-category"
                cat = "unknown_category"
                if m.get("super-category") is not None:
                    super_cat = m["super-category"].lower().replace(" / ", "/")
                if m.get("category") is not None:
                    cat = m["category"].lower().replace(" / ", "/")
                self._model_info[m["model_id"]] = Asset(
                    super_cat, cat, m.get("style"), m.get("theme"),
                    m.get("material"))
        return self._model_info

    @property
    def styles(self):
        return self._styles

    @property
    def themes(self):
        return self._themes

    @property
    def materials(self):
        return self._materials

    @property
    def categories(self):
        return set(s.lower().replace(" / ", "/") for s in self._categories)

    @property
    def super_categories(self):
        return set(
            s.lower().replace(" / ", "/") for s in self._super_categories)

    @classmethod
    def from_file(cls, path_to_model_info: str) -> "ModelInfo":
        with open(path_to_model_info) as f:
            return cls(json.load(f))


class BaseThreedFutureModel:
    """(``threed_front_scene.py:153-174``)"""

    def __init__(self, model_uid, model_jid, position, rotation, scale):
        self.model_uid = model_uid
        self.model_jid = model_jid
        self.position = position
        self.rotation = rotation
        self.scale = scale

    def _transform(self, vertices: np.ndarray) -> np.ndarray:
        """Scale -> quaternion rotate -> translate (3D-Front-Toolbox
        json2obj convention, ``threed_front_scene.py:161-174``).  The
        quaternion is (w, x, y, z); only its vector part drives the
        axis-angle extraction."""
        ref = [0, 0, 1]
        axis = np.cross(ref, self.rotation[1:])
        theta = np.arccos(np.dot(ref, self.rotation[1:])) * 2
        vertices = vertices * self.scale
        if np.sum(axis) != 0 and not np.isnan(theta):
            R = rotation_matrix(axis, theta)
            vertices = vertices.dot(R.T)
        return vertices + self.position


class ThreedFutureModel(BaseThreedFutureModel):
    """A furniture instance placed in a room
    (``threed_front_scene.py:204-394``)."""

    def __init__(self, model_uid, model_jid, model_info, position, rotation,
                 scale, path_to_models):
        super().__init__(model_uid, model_jid, position, rotation, scale)
        self.model_info = model_info
        self.path_to_models = path_to_models
        self._label: Optional[str] = None
        self._size: Optional[np.ndarray] = None

    @property
    def raw_model_path(self) -> str:
        return os.path.join(self.path_to_models, self.model_jid,
                            "raw_model.obj")

    @property
    def texture_image_path(self) -> str:
        return os.path.join(self.path_to_models, self.model_jid, "texture.png")

    @property
    def path_to_bbox_vertices(self) -> str:
        return os.path.join(self.path_to_models, self.model_jid,
                            "bbox_vertices.npy")

    def raw_model(self):
        """(vertices, faces) of the untransformed CAD mesh."""
        return load_obj(self.raw_model_path)

    def raw_model_transformed(self, offset=((0, 0, 0),)):
        v, f = self.raw_model()
        return self._transform(np.asarray(v, np.float64)) + offset, f

    def corners(self, offset=((0, 0, 0),)) -> np.ndarray:
        """Transformed corners of the model-space AABB, ordered like
        trimesh's box primitive (z fastest: index bits = x,y,z) — the
        ordering :attr:`size` depends on (``threed_front_scene.py:270-277``).
        Cached to ``bbox_vertices.npy`` beside the model like the reference
        (:317-324)."""
        try:
            bbox_vertices = np.load(self.path_to_bbox_vertices, mmap_mode="r")
        except Exception:
            v, _ = self.raw_model()
            lo, hi = np.min(v, axis=0), np.max(v, axis=0)
            bbox_vertices = np.array([
                [(hi if i & 4 else lo)[0],
                 (hi if i & 2 else lo)[1],
                 (hi if i & 1 else lo)[2]] for i in range(8)
            ])
            try:
                np.save(self.path_to_bbox_vertices, bbox_vertices)
            except OSError:
                pass  # read-only model library
        return self._transform(np.asarray(bbox_vertices)) + offset

    def centroid(self, offset=((0, 0, 0),)) -> np.ndarray:
        return self.corners(offset).mean(axis=0)

    @property
    def size(self) -> np.ndarray:
        """Half extents from corner distances
        (``threed_front_scene.py:270-277``)."""
        if self._size is None:
            c = self.corners()
            self._size = np.array([
                np.sqrt(np.sum((c[4] - c[0]) ** 2)) / 2,
                np.sqrt(np.sum((c[2] - c[0]) ** 2)) / 2,
                np.sqrt(np.sum((c[1] - c[0]) ** 2)) / 2,
            ])
        return self._size

    def bottom_center(self, offset=((0, 0, 0),)) -> np.ndarray:
        centroid = self.centroid(offset)
        return np.array(
            [centroid[0], centroid[1] - self.size[1], centroid[2]])

    @property
    def bottom_size(self) -> np.ndarray:
        return self.size * [1, 2, 1]

    @property
    def z_angle(self) -> float:
        """Rotation about +y extracted from the placement quaternion,
        wrapped to (-pi, pi] (``threed_front_scene.py:288-305``)."""
        ref = [0, 0, 1]
        axis = np.cross(ref, self.rotation[1:])
        theta = np.arccos(np.dot(ref, self.rotation[1:])) * 2
        if np.sum(axis) == 0 or np.isnan(theta):
            return 0
        assert np.dot(axis, [1, 0, 1]) == 0
        assert 0 <= theta <= 2 * np.pi
        if theta >= np.pi:
            theta = theta - 2 * np.pi
        return np.sign(axis[1]) * theta

    @property
    def label(self) -> str:
        if self._label is None:
            self._label = self.model_info.label
        return self._label

    @label.setter
    def label(self, _label):
        self._label = _label

    def one_hot_label(self, all_labels) -> np.ndarray:
        return np.eye(len(all_labels))[self.int_label(all_labels)]

    def int_label(self, all_labels) -> int:
        return all_labels.index(self.label)

    def copy_from_other_model(self, other_model) -> "ThreedFutureModel":
        """Keep this instance's placement, take the other's CAD asset
        (``threed_front_scene.py:383-394``)."""
        model = ThreedFutureModel(
            model_uid=other_model.model_uid,
            model_jid=other_model.model_jid,
            model_info=other_model.model_info,
            position=self.position,
            rotation=self.rotation,
            scale=other_model.scale,
            path_to_models=self.path_to_models,
        )
        model.label = self.label
        return model


class ThreedFutureExtra(BaseThreedFutureModel):
    """Wall/floor/door meshes carried verbatim in the scene JSON
    (``threed_front_scene.py:397-423``)."""

    def __init__(self, model_uid, model_jid, xyz, faces, model_type,
                 position, rotation, scale):
        super().__init__(model_uid, model_jid, position, rotation, scale)
        self.xyz = xyz
        self.faces = faces
        self.model_type = model_type

    def raw_model_transformed(self, offset=((0, 0, 0),)):
        vertices = self._transform(np.asarray(self.xyz)) + offset
        return vertices, np.asarray(self.faces)


class BaseScene:
    """(reference ``datasets/common.py:219-258``)"""

    def __init__(self, scene_id, scene_type, bboxes):
        self.bboxes = bboxes
        self.scene_id = scene_id
        self.scene_type = scene_type

    def __str__(self):
        return (f"Scene: {self.scene_id} of type: {self.scene_type} "
                f"contains {self.nobjects} bboxes")

    @property
    def nobjects(self) -> int:
        return len(self.bboxes)

    @property
    def object_types(self):
        return sorted(set(b.label for b in self.bboxes))

    @property
    def n_object_types(self) -> int:
        return len(self.object_types)


class Room(BaseScene):
    """A 3D-FRONT room (``threed_front_scene.py:426-641``)."""

    def __init__(self, scene_id, scene_type, bboxes, extras, json_path,
                 path_to_room_masks_dir=None):
        super().__init__(scene_id, scene_type, bboxes)
        self.json_path = json_path
        self.extras = extras
        self.uid = "_".join([self.json_path, scene_id])
        self.path_to_room_masks_dir = path_to_room_masks_dir
        if path_to_room_masks_dir is not None:
            self.path_to_room_mask = os.path.join(
                self.path_to_room_masks_dir, self.uid, "room_mask.png")
        else:
            self.path_to_room_mask = None

    @property
    def floor(self):
        return [e for e in self.extras if e.model_type == "Floor"][0]

    @property
    @lru_cache(maxsize=512)
    def bbox(self):
        corners = np.vstack([f.corners() for f in self.bboxes])
        return np.min(corners, axis=0), np.max(corners, axis=0)

    @property
    def bboxes_centroid(self):
        a, b = self.bbox
        return (a + b) / 2

    @property
    def furniture_in_room(self):
        return [f.label for f in self.bboxes]

    @property
    def floor_plan(self):
        """Concatenated floor meshes as one (vertices, faces) pair."""

        def cat_mesh(m1, m2):
            v1, f1 = m1
            v2, f2 = m2
            return np.vstack([v1, v2]), np.vstack([f1, f2 + len(v1)])

        vertices, faces = reduce(
            cat_mesh,
            ((e.xyz, e.faces) for e in self.extras if e.model_type == "Floor"))
        return np.copy(vertices), np.copy(faces)

    @property
    def floor_plan_bbox(self):
        vertices, _ = self.floor_plan
        return np.min(vertices, axis=0), np.max(vertices, axis=0)

    @property
    def floor_plan_centroid(self):
        a, b = self.floor_plan_bbox
        return (a + b) / 2

    @property
    def centroid(self):
        return self.floor_plan_centroid

    @property
    def count_furniture_in_room(self):
        return Counter(self.furniture_in_room)

    @property
    def room_mask(self) -> np.ndarray:
        return self.room_mask_rotated(0)

    def room_mask_rotated(self, angle: float = 0) -> np.ndarray:
        """(H, W, 3) float layout mask, optionally rotated (rad)
        (``threed_front_scene.py:503-509``)."""
        from PIL import Image

        im = Image.open(self.path_to_room_mask).convert("RGB")
        im = im.rotate(angle * 180 / np.pi, resample=Image.BICUBIC)
        return np.asarray(im).astype(np.float32) / np.float32(255)

    def category_counts(self, class_labels):
        if "start" in class_labels and "end" in class_labels:
            class_labels = class_labels[:-2]
        category_counts = [0] * len(class_labels)
        for di in self.furniture_in_room:
            category_counts[class_labels.index(di)] += 1
        return category_counts

    def ordered_bboxes_with_centroid(self):
        centroids = np.array([f.centroid(-self.centroid) for f in self.bboxes])
        ordering = np.lexsort(centroids.T)
        return [self.bboxes[i] for i in ordering]

    def ordered_bboxes_with_class_labels(self, all_labels):
        centroids = np.array([f.centroid(-self.centroid) for f in self.bboxes])
        int_labels = np.array(
            [[f.int_label(all_labels)] for f in self.bboxes])
        ordering = np.lexsort(np.hstack([centroids, int_labels]).T)
        return [self.bboxes[i] for i in ordering]

    def ordered_bboxes_with_class_frequencies(self, class_order):
        """Most-frequent-class-last ordering used by the
        "class_frequencies" box ordering (``threed_front_scene.py:540-548``)."""
        centroids = np.array([f.centroid(-self.centroid) for f in self.bboxes])
        label_order = np.array(
            [[class_order[f.label]] for f in self.bboxes])
        ordering = np.lexsort(np.hstack([centroids, label_order]).T)
        return [self.bboxes[i] for i in ordering[::-1]]

    def augment_room(self, objects_dataset) -> "Room":
        """Swap one random furniture for its nearest-size library neighbour
        (``threed_front_scene.py:618-641``)."""
        bi = np.random.choice(self.bboxes)
        query_label = bi.label
        query_size = bi.size + np.random.normal(0, 0.02)
        furniture = objects_dataset.get_closest_furniture_to_box(
            query_label, query_size)
        bi_retrieved = bi.copy_from_other_model(furniture)
        new_bboxes = [box for box in self.bboxes if box is not bi] + [
            bi_retrieved]
        return Room(
            scene_id=self.scene_id + "_augm",
            scene_type=self.scene_type,
            bboxes=new_bboxes,
            extras=self.extras,
            json_path=self.json_path,
            path_to_room_masks_dir=self.path_to_room_masks_dir,
        )


# ---------------------------------------------------------------------------
# raw 3D-FRONT JSON ingestion (reference ``datasets/utils.py:19-204``)


def parse_threed_front_scenes(dataset_directory, path_to_model_info,
                              path_to_models, path_to_room_masks_dir=None,
                              cache_path: Optional[str] = None):
    """Parse every scene JSON into a flat list of :class:`Room`.

    ``PATH_TO_SCENES`` (env) or ``cache_path`` short-circuits to a pickle
    like the reference; scale-sanity and duplicate-room filters reproduced
    (``utils.py:78-121``)."""
    pickled = os.getenv("PATH_TO_SCENES") or cache_path
    if pickled and os.path.exists(pickled):
        with open(pickled, "rb") as f:
            return pickle.load(f)

    model_info = ModelInfo.from_file(path_to_model_info).model_info
    layouts = [
        os.path.join(dataset_directory, f)
        for f in sorted(os.listdir(dataset_directory)) if f.endswith(".json")
    ]
    scenes = []
    unique_room_ids = set()
    for m in layouts:
        with open(m) as f:
            data = json.load(f)
        furniture_in_scene = defaultdict()
        for ff in data["furniture"]:
            if ff.get("valid"):
                furniture_in_scene[ff["uid"]] = dict(
                    model_uid=ff["uid"], model_jid=ff["jid"],
                    model_info=model_info[ff["jid"]])
        meshes_in_scene = defaultdict()
        for mm in data["mesh"]:
            meshes_in_scene[mm["uid"]] = dict(
                mesh_uid=mm["uid"], mesh_jid=mm["jid"],
                mesh_xyz=np.asarray(mm["xyz"]).reshape(-1, 3),
                mesh_faces=np.asarray(mm["faces"]).reshape(-1, 3),
                mesh_type=mm["type"])
        rooms = []
        for rr in data["scene"]["room"]:
            furniture_in_room, extra_meshes_in_room = [], []
            is_valid_scene = True
            for cc in rr["children"]:
                if cc["ref"] in furniture_in_scene:
                    tf = furniture_in_scene[cc["ref"]]
                    if any(si < 1e-5 for si in cc["scale"]) or any(
                            si > 5 for si in cc["scale"]):
                        is_valid_scene = False
                        break
                    furniture_in_room.append(ThreedFutureModel(
                        tf["model_uid"], tf["model_jid"], tf["model_info"],
                        cc["pos"], cc["rot"], cc["scale"], path_to_models))
                elif cc["ref"] in meshes_in_scene:
                    mf2 = meshes_in_scene[cc["ref"]]
                    extra_meshes_in_room.append(ThreedFutureExtra(
                        mf2["mesh_uid"], mf2["mesh_jid"], mf2["mesh_xyz"],
                        mf2["mesh_faces"], mf2["mesh_type"],
                        cc["pos"], cc["rot"], cc["scale"]))
            if len(furniture_in_room) > 1 and is_valid_scene:
                if rr["instanceid"] not in unique_room_ids:
                    unique_room_ids.add(rr["instanceid"])
                    rooms.append(Room(
                        rr["instanceid"], rr["type"].lower(),
                        furniture_in_room, extra_meshes_in_room,
                        os.path.basename(m).split(".")[0],
                        path_to_room_masks_dir))
        scenes.append(rooms)
    scenes = sum(scenes, [])
    if pickled:
        with open(pickled, "wb") as f:
            pickle.dump(scenes, f)
    return scenes


def parse_threed_future_models(dataset_directory, path_to_models,
                               path_to_model_info,
                               cache_path: Optional[str] = None):
    """Collect the unique furniture instances across all scenes
    (``utils.py:134-204``)."""
    pickled = os.getenv("PATH_TO_3D_FUTURE_OBJECTS") or cache_path
    if pickled and os.path.exists(pickled):
        with open(pickled, "rb") as f:
            return pickle.load(f)

    model_info = ModelInfo.from_file(path_to_model_info).model_info
    layouts = [
        os.path.join(dataset_directory, f)
        for f in sorted(os.listdir(dataset_directory)) if f.endswith(".json")
    ]
    furnitures = []
    unique_furniture_ids = set()
    for m in layouts:
        with open(m) as f:
            data = json.load(f)
        furniture_in_scene = defaultdict()
        for ff in data["furniture"]:
            if ff.get("valid"):
                furniture_in_scene[ff["uid"]] = dict(
                    model_uid=ff["uid"], model_jid=ff["jid"],
                    model_info=model_info[ff["jid"]])
        for rr in data["scene"]["room"]:
            for cc in rr["children"]:
                if cc["ref"] not in furniture_in_scene:
                    continue
                tf = furniture_in_scene[cc["ref"]]
                if any(si < 1e-5 for si in cc["scale"]) or any(
                        si > 5 for si in cc["scale"]):
                    break
                if tf["model_uid"] not in unique_furniture_ids:
                    unique_furniture_ids.add(tf["model_uid"])
                    furnitures.append(ThreedFutureModel(
                        tf["model_uid"], tf["model_jid"], tf["model_info"],
                        cc["pos"], cc["rot"], cc["scale"], path_to_models))
    if pickled:
        with open(pickled, "wb") as f:
            pickle.dump(furnitures, f)
    return furnitures
