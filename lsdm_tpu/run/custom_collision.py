"""Collision/consistency score between generated objects and the given
scene (reference ``custom_collision.py:82-131``): for each sequence, the
recall-style F-score component between the prediction cloud and ALL given
objects' points — high overlap means the generated object collides with
existing scene geometry.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--predictions_dir", required=True)
    ap.add_argument("--objs_data_dir", default=None)
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.ops.metrics import fscore

    num_cats = cfg_lib.num_cats_for(args.datatype)
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    kw = {"objs_data_dir": args.objs_data_dir} if args.objs_data_dir else {}
    ds = ds_cls(args.data_dir, max_cats=num_cats, **kw)
    loader = DataLoader(ds, 1, shuffle=False)

    scores = []
    for batch in loader:
        seq = batch.seq_names[0]
        pred_path = os.path.join(args.predictions_dir, seq + ".npy")
        if not os.path.exists(pred_path):
            continue
        pred = np.load(pred_path).astype(np.float32).reshape(-1, 3)
        given = np.asarray(batch.given_objs[0]).reshape(-1, 3)
        # recall component of the F-score (reference uses f1_score[2])
        _, _, recall = fscore(
            jnp.asarray(pred), jnp.asarray(given), args.threshold
        )
        scores.append(float(recall))
    print(f"collision score over {len(scores)} sequences: {np.mean(scores):.4f}")


if __name__ == "__main__":
    main()
