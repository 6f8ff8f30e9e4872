"""AMASS -> per-sequence SMPL-X vertex arrays (reference
``pickle_amass_vertices.py:15-83``): load an AMASS npz, run the SMPL-X body
model, export full-resolution verts plus the 655-vertex downsampled version
(D_1 @ D_2 sparse chain).

Offline preprocessing only (the runtime datasets read the exported .npy,
SURVEY.md §2.9).  Requires the external ``smplx`` package and body-model
files, neither of which ships in this environment — the import is gated
and the CLI reports clearly when they are absent.
"""

from __future__ import annotations

import argparse
import os


def pickle_amass_vertices(
    npz_path: str,
    model_folder: str,
    mesh_ds_dir: str,
    out_dir: str,
    gender: str = "neutral",
    max_frames: int = 0,
):
    try:
        import smplx  # noqa: F401
        import torch
    except ImportError as e:  # pragma: no cover - external dependency
        raise SystemExit(
            "pickle_amass_vertices needs the external 'smplx' package and "
            "torch; install them and download the SMPL-X body models "
            f"(import failed: {e})"
        )
    import numpy as np

    from lsdm_tpu.ops.mesh import get_graph_params, ds_us
    import jax.numpy as jnp

    data = np.load(npz_path)
    poses = data["poses"]
    trans = data["trans"]
    betas = data["betas"][:10]
    T = len(poses) if not max_frames else min(max_frames, len(poses))

    body_model = smplx.create(
        model_path=model_folder, model_type="smplx", gender=gender,
        batch_size=1, use_pca=False,
    )
    verts_all = []
    for t in range(T):
        out = body_model(
            betas=torch.tensor(betas[None], dtype=torch.float32),
            global_orient=torch.tensor(poses[t : t + 1, :3], dtype=torch.float32),
            body_pose=torch.tensor(poses[t : t + 1, 3:66], dtype=torch.float32),
            transl=torch.tensor(trans[t : t + 1], dtype=torch.float32),
            return_verts=True,
        )
        verts_all.append(out.vertices.detach().numpy()[0])
    verts = np.stack(verts_all)  # (T, 10475, 3)

    # downsample 10475 -> 655 via D_1 then D_2 (reference :60-74)
    g1 = get_graph_params(mesh_ds_dir, 1)
    g2 = get_graph_params(mesh_ds_dir, 2)
    ds = np.asarray(ds_us(g2.D, ds_us(g1.D, jnp.asarray(verts))))

    os.makedirs(out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(npz_path))[0]
    np.save(os.path.join(out_dir, base + "_verts.npy"), verts.astype(np.float32))
    np.save(os.path.join(out_dir, base + "_verts_ds2.npy"), ds.astype(np.float32))
    return verts.shape, ds.shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True, help="AMASS sequence npz")
    ap.add_argument("--model_folder", required=True, help="SMPL-X models dir")
    ap.add_argument("--mesh_ds_dir", default="data/mesh_ds")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--gender", default="neutral")
    ap.add_argument("--max_frames", type=int, default=0)
    a = ap.parse_args()
    full, ds = pickle_amass_vertices(
        a.npz, a.model_folder, a.mesh_ds_dir, a.out_dir, a.gender, a.max_frames
    )
    print(f"wrote {full} full verts and {ds} downsampled verts")


if __name__ == "__main__":
    main()
