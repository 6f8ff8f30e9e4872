"""Fit CAD meshes to LSDM-generated points (reference ``fit_custom_obj.py``).

Takes the ``predictions/<seq>.npy`` cloud written by ``test_sdm`` as the
contact cluster directly (no voting — the diff vs ``fit_best_obj``), builds
the human SDF, clusters, and runs the grid-search + Adam fitting.

Usage:
  python -m lsdm_tpu.run.fit_custom_obj --file_name out/predictions/X.npy \
      --label table --vertices_path data/.../X_verts.npy \
      --obj_lib data/obj_library --output_dir fitting_results [--sdf_dim 128]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file_name", required=True, help="predictions .npy")
    ap.add_argument("--label", required=True, help="object class name, e.g. table")
    ap.add_argument("--vertices_path", required=True,
                    help="(T, V, 3) human vertex sequence .npy")
    ap.add_argument("--faces_path", default=None)
    ap.add_argument("--obj_lib", required=True, help="candidate .obj directory")
    ap.add_argument("--output_dir", default="fitting_results")
    ap.add_argument("--sdf_dim", type=int, default=256)
    ap.add_argument("--down_sample", type=int, default=8)
    ap.add_argument("--floor_height", type=float, default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu.fitting.fit_objects import cluster_contact_points, fit_contact_clusters
    from lsdm_tpu.fitting.meshio import (
        MPCAT40_CLASS_IDS, read_human_mesh_sequence, sample_surface,
    )
    from lsdm_tpu.fitting.sdf import cached_sdf
    from lsdm_tpu.ops.geometry import estimate_floor_height

    pred = np.load(args.file_name).astype(np.float32).reshape(-1, 3)
    class_id = MPCAT40_CLASS_IDS.get(args.label, 5)

    verts_seq, faces = read_human_mesh_sequence(
        args.vertices_path, args.faces_path, args.down_sample
    )
    if faces is not None:
        surface = np.concatenate(
            [sample_surface(v, faces, 4096, seed=i) for i, v in enumerate(verts_seq)]
        )
    else:
        surface = verts_seq.reshape(-1, 3)

    os.makedirs(args.output_dir, exist_ok=True)
    sdf, centroid, extents = cached_sdf(
        os.path.join(args.output_dir, "human_sdf.npz"), surface, args.sdf_dim
    )
    floor = (
        args.floor_height
        if args.floor_height is not None
        else estimate_floor_height(surface)
    )
    print(f"floor height: {floor:.3f}; sdf grid {args.sdf_dim}^3")

    clusters = cluster_contact_points(pred, class_id)
    if not clusters:
        clusters = [pred]  # whole prediction as one cluster
    print(f"{len(clusters)} contact cluster(s) for class {args.label}")

    results = fit_contact_clusters(
        {class_id: clusters}, args.obj_lib, sdf, centroid, extents, floor,
        os.path.join(args.output_dir, "fit_best_obj"),
    )
    for r in results:
        print(f"cluster {r['cluster']}: best={r['obj_id']} loss={r['loss']:.4f}")


if __name__ == "__main__":
    main()
