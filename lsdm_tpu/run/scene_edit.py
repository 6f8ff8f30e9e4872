"""Language-driven scene editing evaluation (reference ``run/scene_edit.py``).

Three edit types as masks over the ground truth (``:35-56``):
  * ``obj_mod``   — full regeneration (zero mask)
  * ``obj_dis``   — displacement: keep the GT shape, move to the predicted
                    centroid (``:315-318``)
  * ``shape_alt`` — keep the bottom-z quartile, regenerate the rest
                    (``:41-47,320``)

A keyword table maps prompt phrases to replacement scene objects
(``:59-98``); the replacement is aligned to the original target with
multi-start ICP (on-device vmap here vs 1000 sequential open3d runs).
"""

from __future__ import annotations

import argparse
import os

# phrase -> (scene object path fragment, proxd category)  (reference :61-84)
EDIT_KEYWORDS = {
    "rectangle table": ("BasementSittingBooth/table_0", 2),
    "round table": ("MPH8/table_1", 2),
    "square table": ("N0SittingBooth/table_0", 2),
    "two seater sofa": ("MPH8/sofa_0", 4),
    "single bed": ("MPH8/bed_0", 5),
    "meeting table": ("MPH1Library/table_0", 2),
    "eames chair": ("MPH1Library/chair_3", 1),
    "office chair": ("MPH11/chair_0", 1),
    "side cabinet": ("MPH11/cabinet_0", 3),
    "file cabinet": ("MPH11/shelving_0", 3),
    "chest of drawers": ("MPH112/chest_of_drawers_1", 6),
    "double bed": ("MPH112/bed_0", 5),
    "sofa stool": ("N0Sofa/sofa_0", 4),
    "cafe table": ("N0Sofa/table_0", 2),
    "one seater sofa": ("N0Sofa/sofa_2", 4),
    "wall table": ("N3Library/furniture_0", 2),
    "desk": ("N3Office/table_0", 2),
    "monitor": ("N3Office/tv_monitor_0", 8),
    "accent chair": ("N3OpenArea/chair_2", 1),
    "accent table": ("N3OpenArea/table_0", 2),
    "recliner": ("MPH1Library/chair_3", 1),
    "dining chair": ("N0SittingBooth/seating_0", 1),
}


def main():
    ap = argparse.ArgumentParser(description="Language-driven scene editing")
    ap.add_argument("data_dir")
    ap.add_argument("--load_model", default=None)
    ap.add_argument("--objs_data_dir", default="data/protext/objs")
    ap.add_argument("--output_dir", default="edit_output")
    ap.add_argument("--edit_type", default="obj_mod",
                    choices=["obj_mod", "obj_dis", "shape_alt"])
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--icp_tries", type=int, default=64)
    ap.add_argument("--text_encoder", default="auto",
                    choices=["auto", "CLIP", "BERT", "HASH"],
                    help="'auto' = CLIP when a BPE merges source exists "
                         "(tools/vendor_clip_bpe.py), else HASH")
    ap.add_argument("--bpe_path", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--pcd_points", type=int, default=None,
                    help="override cloud size (e.g. tiny smoke runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.models.text import TextEncoder
    from lsdm_tpu.ops.icp import random_restart_icp, transform_points
    from lsdm_tpu.ops.metrics import emd as emd_fn, fscore, topk_accuracy
    from lsdm_tpu.ops.pointcloud import chamfer_distance
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    model_cfg = (
        cfg_lib.sdm_proxd() if args.datatype == "proxd" else cfg_lib.sdm_humanise()
    )
    if args.pcd_points:
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg, pcd_points=args.pcd_points,
            vert_dims=min(model_cfg.vert_dims, args.pcd_points),
        )
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    ds = ds_cls(args.data_dir, objs_data_dir=args.objs_data_dir,
                max_cats=model_cfg.max_cats, pnt_size=model_cfg.pcd_points)
    loader = DataLoader(ds, 1, shuffle=False)

    schedule = make_schedule("cosine", args.diffusion_steps)
    model = SceneDiffusionModel(model_cfg)
    from lsdm_tpu.models.text import resolve_text_encoder

    args.text_encoder = resolve_text_encoder(args.text_encoder,
                                             args.bpe_path)
    text_encoder = TextEncoder(args.text_encoder, dim=model_cfg.clip_dim,
                               bpe_path=args.bpe_path)

    b0 = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0.target_verts), jnp.asarray(b0.mask),
        jnp.zeros((1,), jnp.int32), jnp.asarray(b0.given_objs),
        jnp.asarray(b0.given_cats),
        jnp.asarray(text_encoder.encode(b0.text)),
    )
    state = create_train_state(variables, make_optimizer())
    if args.load_model:
        if args.load_model.endswith(".pt"):
            params, bstats, _ = ckpt_lib.load_torch_checkpoint(
                args.load_model, max_cats=model_cfg.max_cats)
            state = state.replace(params=params,
                                  batch_stats=bstats or state.batch_stats)
        else:
            state, _ = ckpt_lib.load(args.load_model, state)

    def get_edit_mask(gt: np.ndarray) -> np.ndarray:
        """(reference :35-56)"""
        if args.edit_type in ("obj_mod", "obj_dis"):
            return np.zeros_like(gt)
        size = gt.shape[1] // 4
        z = gt[0, :, 2]
        idx = np.argsort(z)[:size]  # bottom-z quartile
        m = np.zeros_like(gt)
        m[:, idx, :] = 1
        return m

    def get_gt_obj(keyword: str, origin_obj: np.ndarray, key):
        """(reference :59-98): fetch the replacement object and ICP-align it
        to the original target."""
        if keyword not in EDIT_KEYWORDS:
            return None
        handle, cat = EDIT_KEYWORDS[keyword]
        path = os.path.join(args.objs_data_dir, handle + ".npy")
        if not os.path.exists(path):
            return None
        obj = np.load(path).astype(np.float32)
        res = random_restart_icp(
            jnp.asarray(obj), jnp.asarray(origin_obj[0]), key,
            n_tries=args.icp_tries, threshold=0.2,
        )
        aligned = np.asarray(
            transform_points(jnp.asarray(obj), res.transformation)
        )[None]
        target_cat = np.zeros((1, model_cfg.max_cats), np.float32)
        target_cat[0, cat] = 1
        return aligned, target_cat, res

    from functools import partial

    from lsdm_tpu.models.sampling import sample_sdm

    @partial(jax.jit, static_argnames=("shape1",))
    def sample_fn(params, batch_stats, mask, objs, cats, text_emb, key, shape1):
        return sample_sdm(
            model, {"params": params, "batch_stats": batch_stats}, schedule,
            mask, objs, cats, text_emb, key, clip_denoised=False,
        )

    os.makedirs(args.output_dir, exist_ok=True)
    for sub in ("predictions", "guiding_points"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    chs, emds, f1s, accs, top3s = [], [], [], [], []
    fits, rmses, sets_ = [], [], []
    lines = []
    for bi, batch in enumerate(loader):
        target = np.asarray(batch.target_verts)
        target_cat = np.asarray(batch.target_cat)
        x_mask = get_edit_mask(target)

        # phrase search over positions 2..4 of the prompt (reference :269-278)
        tokens = batch.text[0].split(" ")[2:5] + ["", "", ""]
        reg = None
        for kw in (tokens[0], f"{tokens[0]} {tokens[1]}",
                   f"{tokens[0]} {tokens[1]} {tokens[2]}"):
            got = get_gt_obj(kw.strip(), target, jax.random.fold_in(key, 1000 + bi))
            if got is not None:
                target, target_cat, reg = got
                break
        if reg is not None:
            fits.append(float(reg.fitness))
            rmses.append(float(reg.inlier_rmse))
            sets_.append(int(reg.n_correspondences))

        sample, last = sample_fn(
            state.params, state.batch_stats,
            jnp.asarray(batch.mask), jnp.asarray(batch.given_objs),
            jnp.asarray(batch.given_cats),
            jnp.asarray(text_encoder.encode(batch.text)),
            jax.random.fold_in(key, bi), target.shape[1],
        )
        pred = np.asarray(sample)
        if args.edit_type == "obj_dis":
            pred = target - target[0].mean(0) + pred[0].mean(0)
        else:
            pred = x_mask * target + (1 - x_mask) * pred

        p, g = jnp.asarray(pred), jnp.asarray(target)
        chs.append(float(chamfer_distance(p, g)))
        emds.append(emd_fn(p, g))
        f1s.append(float(fscore(p[0], g[0], 0.1)[0]))
        tcat = jnp.argmax(jnp.asarray(target_cat), axis=1)
        probs = last.cat[:, 0, :]
        (top1,) = topk_accuracy(probs, tcat, (1,))
        (top3,) = topk_accuracy(probs, tcat, (3,))
        accs.append(float(top1) / 100)
        top3s.append(float(top3) / 100)

        seq = batch.seq_names[0]
        lines.append(f"Chamfer distance for seq {seq}: {chs[-1]:.4f}")
        np.save(os.path.join(args.output_dir, "predictions", seq + ".npy"), pred[0])
        np.save(os.path.join(args.output_dir, "guiding_points", seq + ".npy"),
                np.asarray(last.guiding[0]))

    with open(os.path.join(args.output_dir, "results.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
        f.write(f"Final Chamfer distance: {np.mean(chs):.4f}\n")
        f.write(f"Final EMD: {np.mean(emds):.4f}\n")
        f.write(f"Final F1 score: {np.mean(f1s):.4f}\n")
        f.write(f"Category accuracy: {np.mean(accs):.4f}\n")
        f.write(f"Top 3 accuracy: {np.mean(top3s):.4f}\n")
        if fits:
            f.write(f"Fitness: {np.mean(fits):.4f}\n")
            f.write(f"MSE: {np.mean(rmses):.4f}\n")
            f.write(f"Corr set: {np.mean(sets_):.4f}\n")
    print(f"edit={args.edit_type} CFD {np.mean(chs):.4f} | EMD {np.mean(emds):.4f} "
          f"| F1 {np.mean(f1s):.4f}")


if __name__ == "__main__":
    main()
