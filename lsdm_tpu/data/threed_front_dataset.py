"""3D-FRONT dataset layer: filters, encodings, and the encoding factory.

Full rebuild of the reference's dataset plumbing (host-side numpy, no
torch):

  * :class:`BaseDataset` + the composable scene filters
    (``atiss/scene_synthesis/datasets/common.py:46-216``);
  * :class:`ThreedFront` — raw scene container with dataset-wide bounds /
    class statistics (``datasets/threed_front.py:22-179``);
  * :class:`CachedRoom` / :class:`CachedThreedFrontRooms` — the preprocessed
    ``boxes.npz`` + ``train_stats`` reader (``threed_front.py:182-329``);
    the TPU-static training loader with baked-in wocm split lives in
    ``threed_front.py:CachedThreedFront`` — this class is the
    reference-shaped accessor the encoding chain composes over;
  * the dataset-decorator encoding chain: per-property encoders, dataset
    collection + padding collate, rotation/jitter augmentations, [-1, 1]
    scaling, permutation, class-frequency ordering and the autoregressive
    "WOCM" target splitter
    (``datasets/threed_front_dataset.py:18-467``);
  * :func:`dataset_encoding_factory`, :func:`filter_function`,
    :func:`get_raw_dataset` / :func:`get_dataset_raw_and_encoded` /
    :func:`get_encoded_dataset` (``threed_front_dataset.py:470-534``,
    ``datasets/__init__.py:18-184``);
  * the bedroom/livingroom/library category maps
    (``datasets/base.py:9-204``; public 3D-FRONT label vocabulary).

Randomness: augmentation/permutation/WOCM draws go through a module-level
``np.random`` like the reference — seed with ``np.random.seed`` for
reproducible epochs.
"""

from __future__ import annotations

import csv
import json
import os
from collections import Counter, OrderedDict
from functools import lru_cache
from typing import Dict, List

import numpy as np

from lsdm_tpu.data.threed_front_scene import Room, parse_threed_front_scenes

# --- category maps (datasets/base.py; public 3D-FRONT label vocabulary) ---

THREED_FRONT_BEDROOM_FURNITURE = {
    "desk": "desk",
    "nightstand": "nightstand",
    "king-size bed": "double_bed",
    "single bed": "single_bed",
    "kids bed": "kids_bed",
    "ceiling lamp": "ceiling_lamp",
    "pendant lamp": "pendant_lamp",
    "bookcase/jewelry armoire": "bookshelf",
    "tv stand": "tv_stand",
    "wardrobe": "wardrobe",
    "lounge chair/cafe chair/office chair": "chair",
    "dining chair": "chair",
    "classic chinese chair": "chair",
    "armchair": "armchair",
    "dressing table": "dressing_table",
    "dressing chair": "dressing_chair",
    "corner/side table": "table",
    "dining table": "table",
    "round end table": "table",
    "drawer chest/corner cabinet": "cabinet",
    "sideboard/side cabinet/console table": "cabinet",
    "children cabinet": "children_cabinet",
    "shelf": "shelf",
    "footstool/sofastool/bed end stool/stool": "stool",
    "coffee table": "coffee_table",
    "loveseat sofa": "sofa",
    "three-seat/multi-seat sofa": "sofa",
    "l-shaped sofa": "sofa",
    "lazy sofa": "sofa",
    "chaise longue sofa": "sofa",
}

_COMMON_LIVING = {
    "bookcase/jewelry armoire": "bookshelf",
    "desk": "desk",
    "pendant lamp": "pendant_lamp",
    "ceiling lamp": "ceiling_lamp",
    "lounge chair/cafe chair/office chair": "lounge_chair",
    "dining chair": "dining_chair",
    "dining table": "dining_table",
    "corner/side table": "corner_side_table",
    "classic chinese chair": "chinese_chair",
    "armchair": "armchair",
    "shelf": "shelf",
    "sideboard/side cabinet/console table": "console_table",
    "footstool/sofastool/bed end stool/stool": "stool",
    "barstool": "stool",
    "round end table": "round_end_table",
    "loveseat sofa": "loveseat_sofa",
    "drawer chest/corner cabinet": "cabinet",
    "wardrobe": "wardrobe",
    "three-seat/multi-seat sofa": "multi_seat_sofa",
    "wine cabinet": "wine_cabinet",
    "coffee table": "coffee_table",
    "lazy sofa": "lazy_sofa",
    "children cabinet": "cabinet",
    "chaise longue sofa": "chaise_longue_sofa",
    "l-shaped sofa": "l_shaped_sofa",
    "dressing table": "dressing_table",
    "dressing chair": "dressing_chair",
}

THREED_FRONT_LIBRARY_FURNITURE = dict(_COMMON_LIVING)
THREED_FRONT_LIVINGROOM_FURNITURE = {
    k: v for k, v in _COMMON_LIVING.items()
    if k not in ("dressing table", "dressing chair")
}
THREED_FRONT_LIVINGROOM_FURNITURE["tv stand"] = "tv_stand"


# --- splits (datasets/splits_builder.py) ---


class CSVSplitsBuilder:
    """csv rows of (scene_id, split) -> per-split id lists
    (``splits_builder.py:12-47``)."""

    def __init__(self, train_test_splits_file: str):
        self._file = train_test_splits_file
        self._splits: Dict[str, List[str]] = {}

    def _parse_split_file(self):
        if not self._splits:
            with open(self._file) as f:
                data = [row for row in csv.reader(f)]
            for s in ("train", "test", "val"):
                self._splits[s] = [r[0] for r in data if r[1] == s]
        return self._splits

    def train_split(self):
        return self._parse_split_file()["train"]

    def test_split(self):
        return self._parse_split_file()["test"]

    def val_split(self):
        return self._parse_split_file()["val"]

    def get_splits(self, keep_splits=("train", "val")):
        if isinstance(keep_splits, str):
            keep_splits = [keep_splits]
        s: List[str] = []
        for ks in keep_splits:
            s.extend(self._parse_split_file()[ks])
        return s


# --- base dataset + filters (datasets/common.py:46-216) ---


class BaseDataset:
    """Scene-list dataset with composable filters."""

    def __init__(self, scenes):
        assert len(scenes) > 0
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, idx):
        return self.scenes[idx]

    @property
    def class_labels(self):
        raise NotImplementedError()

    @property
    def n_classes(self):
        return len(self.class_labels)

    @property
    def object_types(self):
        raise NotImplementedError()

    @property
    def n_object_types(self):
        return len(self.object_types)

    @property
    def room_types(self):
        return set(s.scene_type for s in self.scenes)

    @property
    def count_objects_in_rooms(self):
        return Counter(len(s.bboxes) for s in self.scenes)

    def post_process(self, s):
        return s

    @staticmethod
    def with_valid_scene_ids(invalid_scene_ids):
        return lambda scene: (scene if scene.scene_id not in invalid_scene_ids
                              else False)

    @staticmethod
    def with_scene_ids(scene_ids):
        return lambda scene: scene if scene.scene_id in scene_ids else False

    @staticmethod
    def with_room(scene_type):
        return lambda scene: (scene if scene_type in scene.scene_type
                              else False)

    @staticmethod
    def room_smaller_than_along_axis(max_size, axis=1):
        return lambda scene: (scene if scene.bbox[1][axis] <= max_size
                              else False)

    @staticmethod
    def room_larger_than_along_axis(min_size, axis=1):
        return lambda scene: (scene if scene.bbox[0][axis] >= min_size
                              else False)

    @staticmethod
    def floor_plan_with_limits(limit_x, limit_y, axis=(0, 2)):
        def inner(scene):
            min_bbox, max_bbox = scene.floor_plan_bbox
            t_x = max_bbox[axis[0]] - min_bbox[axis[0]]
            t_y = max_bbox[axis[1]] - min_bbox[axis[1]]
            # NOTE reference quirk (common.py:124-126): the else-branch
            # evaluates bare `False` and falls through to returning None —
            # both are falsy, so downstream filtering behaves identically.
            return scene if (t_x <= limit_x and t_y <= limit_y) else False
        return inner

    @staticmethod
    def with_valid_boxes(box_types):
        def inner(scene):
            for i in range(len(scene.bboxes) - 1, -1, -1):
                if scene.bboxes[i].label not in box_types:
                    scene.bboxes.pop(i)
            return scene
        return inner

    @staticmethod
    def without_box_types(box_types):
        def inner(scene):
            for i in range(len(scene.bboxes) - 1, -1, -1):
                if scene.bboxes[i].label in box_types:
                    scene.bboxes.pop(i)
            return scene
        return inner

    @staticmethod
    def with_generic_classes(box_types_map):
        def inner(scene):
            for box in scene.bboxes:
                box.label = box_types_map[box.label]
            return scene
        return inner

    @staticmethod
    def with_valid_bbox_jids(invalid_bbox_jds):
        return lambda scene: (
            False if any(b.model_jid in invalid_bbox_jds for b in scene.bboxes)
            else scene)

    @staticmethod
    def at_most_boxes(n):
        return lambda scene: scene if len(scene.bboxes) <= n else False

    @staticmethod
    def at_least_boxes(n):
        return lambda scene: scene if len(scene.bboxes) >= n else False

    @staticmethod
    def with_object_types(objects):
        return lambda scene: (
            scene if all(b.label in objects for b in scene.bboxes) else False)

    @staticmethod
    def contains_object_types(objects):
        return lambda scene: (
            scene if any(b.label in objects for b in scene.bboxes) else False)

    @staticmethod
    def without_object_types(objects):
        return lambda scene: (
            False if any(b.label in objects for b in scene.bboxes) else scene)

    @staticmethod
    def filter_compose(*filters):
        def inner(scene):
            s = scene
            fs = iter(filters)
            try:
                while s:
                    s = next(fs)(s)
            except StopIteration:
                pass
            return s
        return inner


# --- raw dataset container (datasets/threed_front.py:22-179) ---


class ThreedFront(BaseDataset):
    """Container for parsed 3D-FRONT rooms with dataset statistics."""

    def __init__(self, scenes, bounds=None):
        super().__init__(scenes)
        assert isinstance(self.scenes[0], Room)
        self._object_types = None
        self._room_types = None
        self._count_furniture = None
        self._bbox = None
        self._sizes = self._centroids = self._angles = None
        if bounds is not None:
            self._sizes = bounds["sizes"]
            self._centroids = bounds["translations"]
            self._angles = bounds["angles"]

    def __str__(self):
        return (f"Dataset contains {len(self.scenes)} scenes with "
                f"{self.n_object_types} discrete types")

    @property
    def bbox(self):
        if self._bbox is None:
            lo = np.array([1000.0, 1000, 1000])
            hi = -lo
            for s in self.scenes:
                bbox_min, bbox_max = s.bbox
                lo = np.minimum(bbox_min, lo)
                hi = np.maximum(bbox_max, hi)
            self._bbox = (lo, hi)
        return self._bbox

    def _compute_bounds(self):
        big = np.array([1e7] * 3)
        size_lo, size_hi = big.copy(), -big.copy()
        cen_lo, cen_hi = big.copy(), -big.copy()
        ang_lo, ang_hi = np.array([1e10]), np.array([-1e10])
        for s in self.scenes:
            for f in s.bboxes:
                centroid = f.centroid(-s.centroid)
                cen_lo = np.minimum(centroid, cen_lo)
                cen_hi = np.maximum(centroid, cen_hi)
                size_lo = np.minimum(f.size, size_lo)
                size_hi = np.maximum(f.size, size_hi)
                ang_lo = np.minimum(f.z_angle, ang_lo)
                ang_hi = np.maximum(f.z_angle, ang_hi)
        self._sizes = (size_lo, size_hi)
        self._centroids = (cen_lo, cen_hi)
        self._angles = (ang_lo, ang_hi)

    @property
    def bounds(self):
        return {"translations": self.centroids, "sizes": self.sizes,
                "angles": self.angles}

    @property
    def sizes(self):
        if self._sizes is None:
            self._compute_bounds()
        return self._sizes

    @property
    def centroids(self):
        if self._centroids is None:
            self._compute_bounds()
        return self._centroids

    @property
    def angles(self):
        if self._angles is None:
            self._compute_bounds()
        return self._angles

    @property
    def count_furniture(self):
        if self._count_furniture is None:
            counts = Counter(
                sum((s.furniture_in_room for s in self.scenes), []))
            self._count_furniture = OrderedDict(
                sorted(counts.items(), key=lambda x: -x[1]))
        return self._count_furniture

    @property
    def class_order(self):
        return dict(zip(self.count_furniture.keys(),
                        range(len(self.count_furniture))))

    @property
    def class_frequencies(self):
        counts = self.count_furniture
        total = sum(counts.values())
        return {k: v / total for k, v in counts.items()}

    @property
    def object_types(self):
        if self._object_types is None:
            types = set()
            for s in self.scenes:
                types |= set(s.object_types)
            self._object_types = sorted(types)
        return self._object_types

    @property
    def room_types(self):
        if self._room_types is None:
            self._room_types = set(s.scene_type for s in self.scenes)
        return self._room_types

    @property
    def class_labels(self):
        return self.object_types + ["start", "end"]

    @classmethod
    def from_dataset_directory(cls, dataset_directory, path_to_model_info,
                               path_to_models, path_to_room_masks_dir=None,
                               path_to_bounds=None, filter_fn=lambda s: s):
        scenes = parse_threed_front_scenes(
            dataset_directory, path_to_model_info, path_to_models,
            path_to_room_masks_dir)
        bounds = None
        if path_to_bounds:
            bounds = np.load(path_to_bounds, allow_pickle=True)
        return cls([s for s in map(filter_fn, scenes) if s], bounds)


# --- cached preprocessed rooms (datasets/threed_front.py:182-329) ---


class CachedRoom:
    def __init__(self, scene_id, room_layout, floor_plan_vertices,
                 floor_plan_faces, floor_plan_centroid, class_labels,
                 translations, sizes, angles, image_path):
        self.scene_id = scene_id
        self.room_layout = room_layout
        self.floor_plan_faces = floor_plan_faces
        self.floor_plan_vertices = floor_plan_vertices
        self.floor_plan_centroid = floor_plan_centroid
        self.class_labels = class_labels
        self.translations = translations
        self.sizes = sizes
        self.angles = angles
        self.image_path = image_path

    @property
    def floor_plan(self):
        return (np.copy(self.floor_plan_vertices),
                np.copy(self.floor_plan_faces))

    @property
    def room_mask(self):
        return self.room_layout[:, :, None]


class CachedThreedFrontRooms(ThreedFront):
    """Reader over the standard preprocessed layout:
    ``<base_dir>/<tag>/boxes.npz`` + renders + a ``train_stats`` json
    (``datasets/threed_front.py:217-329``).  The encoding chain composes
    over :meth:`get_room_params`."""

    def __init__(self, base_dir, config, scene_ids):
        self._base_dir = base_dir
        self.config = config
        self._parse_train_stats(config["train_stats"])
        self._tags = sorted(
            oi for oi in os.listdir(self._base_dir)
            if "_" in oi and oi.split("_")[1] in scene_ids)
        self._path_to_rooms = sorted(
            os.path.join(self._base_dir, pi, "boxes.npz")
            for pi in self._tags)
        rendered_scene = "rendered_scene_256.png"
        if self._tags and not os.path.isfile(os.path.join(
                self._base_dir, self._tags[0], rendered_scene)):
            rendered_scene = "rendered_scene_256_no_lamps.png"
        self._path_to_renders = sorted(
            os.path.join(self._base_dir, pi, rendered_scene)
            for pi in self._tags)

    def _get_room_layout(self, room_layout: np.ndarray) -> np.ndarray:
        from PIL import Image

        img = Image.fromarray(room_layout[:, :, 0])
        img = img.resize(
            tuple(map(int, self.config["room_layout_size"].split(","))),
            resample=Image.BILINEAR)
        return np.asarray(img).astype(np.float32) / np.float32(255)

    @lru_cache(maxsize=32)
    def __getitem__(self, i):
        D = np.load(self._path_to_rooms[i])
        return CachedRoom(
            scene_id=D["scene_id"],
            room_layout=self._get_room_layout(D["room_layout"]),
            floor_plan_vertices=D["floor_plan_vertices"],
            floor_plan_faces=D["floor_plan_faces"],
            floor_plan_centroid=D["floor_plan_centroid"],
            class_labels=D["class_labels"],
            translations=D["translations"],
            sizes=D["sizes"],
            angles=D["angles"],
            image_path=self._path_to_renders[i])

    def get_room_params(self, i) -> Dict[str, np.ndarray]:
        D = np.load(self._path_to_rooms[i])
        room = self._get_room_layout(D["room_layout"])
        room = np.transpose(room[:, :, None], (2, 0, 1))
        return {
            "room_layout": room,
            "class_labels": D["class_labels"],
            "translations": D["translations"],
            "sizes": D["sizes"],
            "angles": D["angles"],
        }

    def __len__(self):
        return len(self._path_to_rooms)

    def _parse_train_stats(self, train_stats):
        with open(os.path.join(self._base_dir, train_stats)) as f:
            ts = json.load(f)
        c = ts["bounds_translations"]
        self._centroids = (np.array(c[:3]), np.array(c[3:]))
        s = ts["bounds_sizes"]
        self._sizes = (np.array(s[:3]), np.array(s[3:]))
        a = ts["bounds_angles"]
        self._angles = (np.array(a[0]), np.array(a[1]))
        self._class_labels = ts["class_labels"]
        self._object_types = ts["object_types"]
        self._class_frequencies = ts["class_frequencies"]
        self._class_order = ts["class_order"]
        self._count_furniture = ts["count_furniture"]

    @property
    def class_labels(self):
        return self._class_labels

    @property
    def object_types(self):
        return self._object_types

    @property
    def class_frequencies(self):
        return self._class_frequencies

    @property
    def class_order(self):
        return self._class_order

    @property
    def count_furniture(self):
        return self._count_furniture


# --- encoding chain (datasets/threed_front_dataset.py:18-467) ---


class DatasetDecoratorBase:
    """Composable dataset decorator."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[idx]

    @property
    def bounds(self):
        return self._dataset.bounds

    @property
    def n_classes(self):
        return self._dataset.n_classes

    @property
    def class_labels(self):
        return self._dataset.class_labels

    @property
    def class_frequencies(self):
        return self._dataset.class_frequencies

    @property
    def n_object_types(self):
        return self._dataset.n_object_types

    @property
    def object_types(self):
        return self._dataset.object_types

    @property
    def feature_size(self):
        return self.bbox_dims + self.n_classes

    @property
    def bbox_dims(self):
        raise NotImplementedError()

    def post_process(self, s):
        return self._dataset.post_process(s)


class BoxOrderedDataset(DatasetDecoratorBase):
    def __init__(self, dataset, box_ordering=None):
        super().__init__(dataset)
        self.box_ordering = box_ordering

    @lru_cache(maxsize=16)
    def _get_boxes(self, scene_idx):
        scene = self._dataset[scene_idx]
        if self.box_ordering is None:
            return scene.bboxes
        elif self.box_ordering == "class_frequencies":
            return scene.ordered_bboxes_with_class_frequencies(
                self.class_frequencies)
        else:
            raise NotImplementedError()


class DataEncoder(BoxOrderedDataset):
    @property
    def property_type(self):
        raise NotImplementedError()


class RoomLayoutEncoder(DataEncoder):
    property_type = "room_layout"
    bbox_dims = 0

    def __getitem__(self, idx):
        img = self._dataset[idx].room_mask[:, :, 0:1]
        return np.transpose(img, (2, 0, 1))


class ClassLabelsEncoder(DataEncoder):
    property_type = "class_labels"
    bbox_dims = 0

    def __getitem__(self, idx):
        classes = self.class_labels
        boxes = self._get_boxes(idx)
        class_labels = np.zeros((len(boxes), len(classes)), np.float32)
        for i, bs in enumerate(boxes):
            class_labels[i] = bs.one_hot_label(classes)
        return class_labels


class TranslationEncoder(DataEncoder):
    property_type = "translations"
    bbox_dims = 3

    def __getitem__(self, idx):
        scene = self._dataset[idx]
        boxes = self._get_boxes(idx)
        translations = np.zeros((len(boxes), 3), np.float32)
        for i, bs in enumerate(boxes):
            translations[i] = bs.centroid(-scene.centroid)
        return translations


class SizeEncoder(DataEncoder):
    property_type = "sizes"
    bbox_dims = 3

    def __getitem__(self, idx):
        boxes = self._get_boxes(idx)
        sizes = np.zeros((len(boxes), 3), np.float32)
        for i, bs in enumerate(boxes):
            sizes[i] = bs.size
        return sizes


class AngleEncoder(DataEncoder):
    property_type = "angles"
    bbox_dims = 1

    def __getitem__(self, idx):
        boxes = self._get_boxes(idx)
        angles = np.zeros((len(boxes), 1), np.float32)
        for i, bs in enumerate(boxes):
            angles[i] = bs.z_angle
        return angles


class DatasetCollection(DatasetDecoratorBase):
    def __init__(self, *datasets):
        super().__init__(datasets[0])
        self._datasets = datasets

    @property
    def bbox_dims(self):
        return sum(d.bbox_dims for d in self._datasets)

    def __getitem__(self, idx):
        return {d.property_type: d[idx] for d in self._datasets}

    @staticmethod
    def collate_fn(samples) -> Dict[str, np.ndarray]:
        """Pad 2-D per-box arrays to the batch max length, stack the rest,
        add "lengths"; *_tr targets gain a singleton box axis
        (``threed_front_dataset.py:205-247``).  Returns float32 numpy —
        feed to jnp directly."""
        key_set = set(samples[0].keys()) - {"length"}
        max_length = max(sample["length"] for sample in samples)
        padding_keys = set(
            k for k in key_set if len(np.shape(samples[0][k])) == 2)
        out = {
            k: np.stack([s[k] for s in samples], axis=0)
            for k in key_set - padding_keys
        }
        out.update({
            k: np.stack([
                np.vstack([
                    s[k],
                    np.zeros((max_length - len(s[k]), np.shape(s[k])[1]))
                ]) for s in samples
            ], axis=0)
            for k in padding_keys
        })
        out["lengths"] = np.array([s["length"] for s in samples])
        out = {k: np.asarray(v, np.float32) for k, v in out.items()}
        out.update({k: v[:, None] for k, v in out.items() if "_tr" in k})
        return out


class CachedDatasetCollection(DatasetCollection):
    def __init__(self, dataset):
        super().__init__(dataset)
        self._dataset = dataset

    def __getitem__(self, idx):
        return self._dataset.get_room_params(idx)

    @property
    def bbox_dims(self):
        return self._dataset.bbox_dims


class RotationAugmentation(DatasetDecoratorBase):
    def __init__(self, dataset, min_rad=0.174533, max_rad=5.06145):
        super().__init__(dataset)
        self._min_rad = min_rad
        self._max_rad = max_rad

    @staticmethod
    def rotation_matrix_around_y(theta):
        R = np.zeros((3, 3))
        R[0, 0] = np.cos(theta)
        R[0, 2] = -np.sin(theta)
        R[2, 0] = np.sin(theta)
        R[2, 2] = np.cos(theta)
        R[1, 1] = 1.0
        return R

    @property
    def rot_angle(self):
        if np.random.rand() < 0.5:
            return np.random.uniform(self._min_rad, self._max_rad)
        return 0.0

    def __getitem__(self, idx):
        rot_angle = self.rot_angle
        R = RotationAugmentation.rotation_matrix_around_y(rot_angle)
        sample_params = self._dataset[idx]
        for k, v in sample_params.items():
            if k == "translations":
                sample_params[k] = v.dot(R)
            elif k == "angles":
                angle_min, angle_max = self.bounds["angles"]
                sample_params[k] = (
                    (v + rot_angle - angle_min) % (2 * np.pi) + angle_min)
            elif k == "room_layout":
                from scipy.ndimage import rotate

                img = np.transpose(v, (1, 2, 0))
                sample_params[k] = np.transpose(
                    rotate(img, rot_angle * 180 / np.pi, reshape=False),
                    (2, 0, 1))
        return sample_params


class Scale(DatasetDecoratorBase):
    """Min-max scale bounded properties into [-1, 1]
    (``threed_front_dataset.py:309-348``)."""

    bbox_dims = 3 + 3 + 1

    @staticmethod
    def scale(x, minimum, maximum):
        X = np.clip(x.astype(np.float32), minimum, maximum)
        X = (X - minimum) / (maximum - minimum)
        return 2 * X - 1

    @staticmethod
    def descale(x, minimum, maximum):
        x = (x + 1) / 2
        return x * (maximum - minimum) + minimum

    def __getitem__(self, idx):
        bounds = self.bounds
        sample_params = self._dataset[idx]
        for k, v in sample_params.items():
            if k in bounds:
                sample_params[k] = Scale.scale(v, bounds[k][0], bounds[k][1])
        return sample_params

    def post_process(self, s):
        bounds = self.bounds
        sample_params = {}
        for k, v in s.items():
            if k in ("room_layout", "class_labels"):
                sample_params[k] = v
            else:
                sample_params[k] = Scale.descale(
                    v, bounds[k][0], bounds[k][1])
        return super().post_process(sample_params)


class Jitter(DatasetDecoratorBase):
    def __getitem__(self, idx):
        sample_params = self._dataset[idx]
        for k, v in sample_params.items():
            if k in ("room_layout", "class_labels"):
                sample_params[k] = v
            else:
                sample_params[k] = v + np.random.normal(0, 0.01)
        return sample_params


class Permutation(DatasetDecoratorBase):
    def __init__(self, dataset, permutation_keys, permutation_axis=0):
        super().__init__(dataset)
        self._permutation_keys = permutation_keys
        self._permutation_axis = permutation_axis

    def __getitem__(self, idx):
        sample_params = self._dataset[idx]
        shapes = sample_params["class_labels"].shape
        ordering = np.random.permutation(shapes[self._permutation_axis])
        for k in self._permutation_keys:
            sample_params[k] = sample_params[k][ordering]
        return sample_params


class OrderedDataset(DatasetDecoratorBase):
    def __init__(self, dataset, ordered_keys, box_ordering=None):
        super().__init__(dataset)
        self._ordered_keys = ordered_keys
        self._box_ordering = box_ordering

    def __getitem__(self, idx):
        if self._box_ordering is None:
            return self._dataset[idx]
        if self._box_ordering != "class_frequencies":
            raise NotImplementedError()
        sample = self._dataset[idx]
        order = self._get_class_frequency_order(sample)
        for k in self._ordered_keys:
            sample[k] = sample[k][order]
        return sample

    def _get_class_frequency_order(self, sample):
        t = sample["translations"]
        c = sample["class_labels"].argmax(-1)
        class_frequencies = self.class_frequencies
        class_labels = self.class_labels
        f = np.array([[class_frequencies[class_labels[ci]]] for ci in c])
        return np.lexsort(np.hstack([t, f]).T)[::-1]


class Autoregressive(DatasetDecoratorBase):
    """Append the end symbol to every property as the *_tr target track
    (``threed_front_dataset.py:411-446``)."""

    bbox_dims = 7

    def __getitem__(self, idx):
        sample_params = self._dataset[idx]
        sample_params_target = {}
        for k, v in sample_params.items():
            if k in ("room_layout", "length"):
                pass
            elif k == "class_labels":
                class_labels = np.copy(v)
                _, C = class_labels.shape
                end_label = np.eye(C)[-1]
                sample_params_target[k + "_tr"] = np.vstack(
                    [class_labels, end_label])
            else:
                p = np.copy(v)
                _, C = p.shape
                sample_params_target[k + "_tr"] = np.vstack([p, np.zeros(C)])
        sample_params.update(sample_params_target)
        sample_params["length"] = sample_params["class_labels"].shape[0]
        return sample_params

    def collate_fn(self, samples):
        return DatasetCollection.collate_fn(samples)


class AutoregressiveWOCM(Autoregressive):
    """"Without causal masking": pick a random split point, boxes before it
    are the context, the box at it is the target
    (``threed_front_dataset.py:449-467``)."""

    def __getitem__(self, idx):
        sample_params = super().__getitem__(idx)
        L, _ = sample_params["class_labels"].shape
        n_boxes = np.random.randint(0, L + 1)
        for k, v in sample_params.items():
            if k in ("room_layout", "length"):
                pass
            elif "_tr" in k:
                sample_params[k] = v[n_boxes]
            else:
                sample_params[k] = v[:n_boxes]
        sample_params["length"] = n_boxes
        return sample_params


def dataset_encoding_factory(name, dataset, augmentations=None,
                             box_ordering=None):
    """(``threed_front_dataset.py:470-534``).  The reference's "basic" branch
    references encoders that only exist on the non-cached path — same
    constraint enforced here with a clear error."""
    if "cached" in name:
        dataset_collection = OrderedDataset(
            CachedDatasetCollection(dataset),
            ["class_labels", "translations", "sizes", "angles"],
            box_ordering=box_ordering)
    else:
        box_ordered_dataset = BoxOrderedDataset(dataset, box_ordering)
        room_layout = RoomLayoutEncoder(box_ordered_dataset)
        class_labels = ClassLabelsEncoder(box_ordered_dataset)
        translations = TranslationEncoder(box_ordered_dataset)
        sizes = SizeEncoder(box_ordered_dataset)
        angles = AngleEncoder(box_ordered_dataset)
        dataset_collection = DatasetCollection(
            room_layout, class_labels, translations, sizes, angles)
        if name == "basic":
            return DatasetCollection(class_labels, translations, sizes,
                                     angles)

    if isinstance(augmentations, list):
        for aug_type in augmentations:
            if aug_type == "rotations":
                dataset_collection = RotationAugmentation(dataset_collection)
            elif aug_type == "jitter":
                dataset_collection = Jitter(dataset_collection)

    dataset_collection = Scale(dataset_collection)
    if "eval" in name:
        return dataset_collection
    elif "wocm_no_prm" in name:
        return AutoregressiveWOCM(dataset_collection)
    elif "wocm" in name:
        dataset_collection = Permutation(
            dataset_collection,
            ["class_labels", "translations", "sizes", "angles"])
        return AutoregressiveWOCM(dataset_collection)
    raise NotImplementedError(f"unknown encoding {name!r}")


# --- top-level entry points (datasets/__init__.py:18-184) ---


def get_raw_dataset(config, filter_fn=lambda s: s, path_to_bounds=None,
                    split=("train", "val")):
    dataset_type = config["dataset_type"]
    if "cached" in dataset_type:
        splits_builder = CSVSplitsBuilder(config["annotation_file"])
        split_scene_ids = splits_builder.get_splits(split)
        return CachedThreedFrontRooms(
            config["dataset_directory"], config=config,
            scene_ids=split_scene_ids)
    return ThreedFront.from_dataset_directory(
        config["dataset_directory"],
        config["path_to_model_info"],
        config["path_to_models"],
        config.get("path_to_room_masks_dir"),
        path_to_bounds, filter_fn)


def get_dataset_raw_and_encoded(config, filter_fn=lambda s: s,
                                path_to_bounds=None, augmentations=None,
                                split=("train", "val")):
    dataset = get_raw_dataset(config, filter_fn, path_to_bounds, split=split)
    encoding = dataset_encoding_factory(
        config.get("encoding_type"), dataset, augmentations,
        config.get("box_ordering", None))
    return dataset, encoding


def get_encoded_dataset(config, filter_fn=lambda s: s, path_to_bounds=None,
                        augmentations=None, split=("train", "val")):
    _, encoding = get_dataset_raw_and_encoded(
        config, filter_fn, path_to_bounds, augmentations, split)
    return encoding


def filter_function(config, split=("train", "val"), without_lamps=False):
    """(``datasets/__init__.py:78-184``)"""
    if config["filter_fn"] == "no_filtering":
        return lambda s: s
    if config["filter_fn"] == "non_empty":
        return lambda s: s if len(s.bboxes) > 0 else False

    with open(config["path_to_invalid_scene_ids"]) as f:
        invalid_scene_ids = set(l.strip() for l in f)
    with open(config["path_to_invalid_bbox_jids"]) as f:
        invalid_bbox_jids = set(l.strip() for l in f)
    splits_builder = CSVSplitsBuilder(config["annotation_file"])
    split_scene_ids = splits_builder.get_splits(split)
    no_lamps = ["ceiling_lamp", "pendant_lamp"] if without_lamps else [""]

    if "threed_front_bedroom" in config["filter_fn"]:
        return BaseDataset.filter_compose(
            BaseDataset.with_room("bed"),
            BaseDataset.at_least_boxes(3),
            BaseDataset.at_most_boxes(13),
            BaseDataset.with_object_types(
                list(THREED_FRONT_BEDROOM_FURNITURE.keys())),
            BaseDataset.with_generic_classes(THREED_FRONT_BEDROOM_FURNITURE),
            BaseDataset.with_valid_scene_ids(invalid_scene_ids),
            BaseDataset.with_valid_bbox_jids(invalid_bbox_jids),
            BaseDataset.contains_object_types(
                ["double_bed", "single_bed", "kids_bed"]),
            BaseDataset.room_smaller_than_along_axis(4.0, axis=1),
            BaseDataset.room_larger_than_along_axis(-0.005, axis=1),
            BaseDataset.floor_plan_with_limits(6, 6, axis=[0, 2]),
            BaseDataset.without_box_types(no_lamps),
            BaseDataset.with_scene_ids(split_scene_ids))
    if "threed_front_livingroom" in config["filter_fn"] or \
            "threed_front_diningroom" in config["filter_fn"]:
        room = ("living" if "livingroom" in config["filter_fn"] else "dining")
        return BaseDataset.filter_compose(
            BaseDataset.with_room(room),
            BaseDataset.at_least_boxes(3),
            BaseDataset.at_most_boxes(21),
            BaseDataset.with_object_types(
                list(THREED_FRONT_LIVINGROOM_FURNITURE.keys())),
            BaseDataset.with_generic_classes(
                THREED_FRONT_LIVINGROOM_FURNITURE),
            BaseDataset.with_valid_scene_ids(invalid_scene_ids),
            BaseDataset.with_valid_bbox_jids(invalid_bbox_jids),
            BaseDataset.room_smaller_than_along_axis(4.0, axis=1),
            BaseDataset.room_larger_than_along_axis(-0.005, axis=1),
            BaseDataset.floor_plan_with_limits(12, 12, axis=[0, 2]),
            BaseDataset.without_box_types(no_lamps),
            BaseDataset.with_scene_ids(split_scene_ids))
    if "threed_front_library" in config["filter_fn"]:
        return BaseDataset.filter_compose(
            BaseDataset.with_room("library"),
            BaseDataset.at_least_boxes(3),
            BaseDataset.with_object_types(
                list(THREED_FRONT_LIBRARY_FURNITURE.keys())),
            BaseDataset.with_generic_classes(THREED_FRONT_LIBRARY_FURNITURE),
            BaseDataset.with_valid_scene_ids(invalid_scene_ids),
            BaseDataset.with_valid_bbox_jids(invalid_bbox_jids),
            BaseDataset.room_smaller_than_along_axis(4.0, axis=1),
            BaseDataset.room_larger_than_along_axis(-0.005, axis=1),
            BaseDataset.floor_plan_with_limits(6, 6, axis=[0, 2]),
            BaseDataset.without_box_types(no_lamps),
            BaseDataset.with_scene_ids(split_scene_ids))
    raise NotImplementedError(config["filter_fn"])
