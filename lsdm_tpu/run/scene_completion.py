"""Add non-contact objects to a fitted scene (reference
``scene_completion.py``).

Pipeline per iteration (reference ``:83-272``): bbox all fitted objects +
human meshes -> virtual square scene -> ATISS ``distribution_classes`` for
the next object class -> 256^2 occupancy grid, rejection-sample a free cell
that fits the candidate's footprint -> floor-align, write
``opt_best.obj`` + ``best_obj_id.json`` (tagged ``no_contact``).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from pathlib import Path

import numpy as np

# 3D-FUTURE-style class vocabulary (reference ``scene_completion.py:8-39``)
OBJECT_TYPES = [
    "armchair", "bookshelf", "cabinet", "ceiling_lamp", "chair",
    "children_cabinet", "coffee_table", "desk", "double_bed", "dressing_chair",
    "dressing_table", "kids_bed", "nightstand", "pendant_lamp", "shelf",
    "single_bed", "sofa", "stool", "table", "tv_stand", "wardrobe", "other",
    "none",
]


def get_grid_index(scene_center, half_len, grid_size, point):
    top_left = np.array([scene_center[0] - half_len, scene_center[1] - half_len])
    cell = half_len * 2 / grid_size
    return np.floor((np.asarray(point) - top_left) / cell).astype(int)


def get_cell_center(scene_center, scene_length, grid_size, idx):
    """World-space center of grid cell (i, j).

    Bugfix vs the reference (``scene_completion.py:49-51``): the upstream
    version returns grid-local coordinates and then feeds them to
    ``get_grid_index`` which expects world coordinates — correct only when
    the scene happens to be centered at (L/2, L/2).
    """
    cell = scene_length / grid_size
    top_left = np.array([scene_center[0] - scene_length / 2,
                         scene_center[1] - scene_length / 2])
    return top_left + np.array([(idx[0] + 0.5) * cell, (idx[1] + 0.5) * cell])


def area_occupied(occ, tl, br):
    return occ[tl[0] : br[0] + 1, tl[1] : br[1] + 1].sum() != 0


def aabb_of_obj(path: str):
    from lsdm_tpu.fitting.meshio import load_mesh

    verts, _ = load_mesh(path)
    lo, hi = verts.min(0), verts.max(0)
    return (lo + hi) / 2, (hi - lo) / 2  # center, half extent


def collect_fitted_bboxes(fit_dir: Path):
    boxes, classes = [], []
    for class_dir in sorted(fit_dir.iterdir()):
        if not class_dir.is_dir():
            continue
        for obj_dir in sorted(class_dir.iterdir()):
            meta = obj_dir / "best_obj_id.json"
            if not meta.exists():
                continue
            best = json.load(open(meta))
            mesh = obj_dir / best["best_obj_id"] / "opt_best.obj"
            if not mesh.exists():
                cand = list(obj_dir.glob("*/opt_best.obj")) + list(
                    obj_dir.glob("opt_best.obj")
                )
                if not cand:
                    continue
                mesh = cand[0]
            boxes.append(aabb_of_obj(str(mesh)))
            classes.append(class_dir.name)
    return boxes, classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fitting_results_path", required=True)
    ap.add_argument("--obj_dataset_path", required=True)
    ap.add_argument("--path_to_model", default=None, help="ATISS .ckpt")
    ap.add_argument("--num_iter", type=int, default=3)
    ap.add_argument("--spare_length", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu.fitting.fit_objects import align_to_floor
    from lsdm_tpu.fitting.meshio import write_obj
    from lsdm_tpu.models.atiss import AutoregressiveTransformer
    from lsdm_tpu.ops.spiral import load_obj
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    rng = np.random.RandomState(args.seed)
    fit_dir = Path(args.fitting_results_path) / "fit_best_obj"
    obj_dataset = Path(args.obj_dataset_path)

    # drop previously added non-contact objects (reference :93-101)
    for class_dir in list(fit_dir.iterdir()) if fit_dir.exists() else []:
        if not class_dir.is_dir():
            continue
        for obj_dir in list(class_dir.iterdir()):
            meta = obj_dir / "best_obj_id.json"
            if meta.exists() and json.load(open(meta)).get("no_contact"):
                shutil.rmtree(obj_dir)
        if not any(class_dir.iterdir()):
            class_dir.rmdir()

    C = len(OBJECT_TYPES)
    model = AutoregressiveTransformer(n_classes=C)

    def make_boxes(classes):
        n = max(len(classes), 1)
        cl = np.zeros((1, n, C), np.float32)
        for i, name in enumerate(classes):
            if name in OBJECT_TYPES:
                cl[0, i, OBJECT_TYPES.index(name)] = 1
        return {
            "class_labels": jnp.asarray(cl),
            "translations": jnp.zeros((1, n, 3)),
            "sizes": jnp.zeros((1, n, 3)),
            "angles": jnp.zeros((1, n, 1)),
            "room_layout": jnp.ones((1, 1, 64, 64)),
            "class_labels_tr": jnp.zeros((1, 1, C)),
            "translations_tr": jnp.zeros((1, 1, 3)),
            "sizes_tr": jnp.zeros((1, 1, 3)),
            "angles_tr": jnp.zeros((1, 1, 1)),
        }

    boxes0, classes0 = collect_fitted_bboxes(fit_dir)
    variables = model.init(jax.random.PRNGKey(args.seed), make_boxes(classes0))
    state = create_train_state(variables, make_optimizer())
    if args.path_to_model:
        state, _ = ckpt_lib.load(args.path_to_model, state)

    # human bboxes every 8th frame (reference get_human_list :72-80)
    human_boxes = []
    human_dir = Path(args.fitting_results_path) / "human" / "mesh"
    if human_dir.exists():
        for p in sorted(human_dir.iterdir())[::8]:
            if p.suffix in (".obj", ".ply"):
                human_boxes.append(aabb_of_obj(str(p)))

    obj_boxes, classes = collect_fitted_bboxes(fit_dir)
    total = obj_boxes + human_boxes
    if not total:
        print("nothing fitted yet; nothing to complete")
        return
    scene_center = np.mean([c for c, _ in total], axis=0)
    scene_length = max(
        2 * (np.abs(c - scene_center)[:2].max() + h[:2].max()) for c, h in total
    ) + args.spare_length

    grid_size = 256
    for it in range(args.num_iter):
        obj_boxes, classes = collect_fitted_bboxes(fit_dir)
        total = obj_boxes + human_boxes
        probs = np.asarray(
            model.apply({"params": state.params}, make_boxes(classes),
                        method=model.distribution_classes)
        )[0, 0]
        probs = probs / probs.sum()

        occ = np.zeros((grid_size, grid_size))
        for c, h in total:
            tl = get_grid_index(scene_center, scene_length / 2, grid_size, (c - h)[:2])
            br = get_grid_index(scene_center, scene_length / 2, grid_size, (c + h)[:2])
            occ[max(tl[0], 0) : br[0] + 1, max(tl[1], 0) : br[1] + 1] = 1

        # sample a class with an existing candidate directory (reference :201-208)
        sampled = None
        for _ in range(100):
            k = rng.choice(C, p=probs)
            if (obj_dataset / OBJECT_TYPES[k]).exists():
                sampled = OBJECT_TYPES[k]
                break
        if sampled is None:
            print("no sampleable class has candidates on disk")
            continue
        print(f"iter {it}: sampled class {sampled}")

        candidates = sorted((obj_dataset / sampled).glob("**/*.obj"))
        if len(candidates) > 3:
            candidates = list(rng.choice(candidates, size=3, replace=False))
        added = False
        for cand in candidates:
            verts, faces = load_obj(str(cand))
            half = (verts.max(0) - verts.min(0))[:2] / 2
            free = np.argwhere(occ == 0)
            rng.shuffle(free)
            for (i, j) in free[:2000]:
                cc = get_cell_center(scene_center, scene_length, grid_size, (i, j))
                tl = get_grid_index(scene_center, scene_length / 2, grid_size, cc - half)
                br = get_grid_index(scene_center, scene_length / 2, grid_size, cc + half)
                if (tl < 0).any() or (br >= grid_size).any():
                    continue
                if not area_occupied(occ, tl, br):
                    v = align_to_floor(verts, 0.0)
                    center = v.mean(0)
                    target = np.array([cc[0], cc[1], center[2]])
                    v = v - center + target
                    save_dir = fit_dir / sampled
                    save_dir.mkdir(parents=True, exist_ok=True)
                    slot = save_dir / str(len(list(save_dir.iterdir())))
                    mesh_dir = slot / cand.stem
                    mesh_dir.mkdir(parents=True)
                    write_obj(str(mesh_dir / "opt_best.obj"), v, faces)
                    json.dump(
                        {"best_obj_id": cand.stem, "no_contact": True},
                        open(slot / "best_obj_id.json", "w"),
                    )
                    print(f"placed {cand.stem} at {target[:2]}")
                    added = True
                    break
            if added:
                break
        if not added:
            print(f"failed to place any {sampled} (scene too crowded)")


if __name__ == "__main__":
    main()
