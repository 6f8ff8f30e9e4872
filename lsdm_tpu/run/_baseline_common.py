"""Shared train/eval machinery for the ATISS / MIME / ContactFormer-bridge
baselines (reference ``run/{train,test}_{atiss,mime,cf_atiss}.py``).

Protocol notes (mirroring the reference):
  * boxes come from PCA OBBs of the given objects' point clouds
    (``translate_objs_to_bbox``); the room layout is a constant ones mask;
    the *_tr target slots are constant ones (``run/train_atiss.py:61-73``);
  * train loss = MSE(sizes) + MSE(translations) + CE(class)
    (``run/train_atiss.py:85-87``);
  * eval converts BOTH the predicted bbox and the GT object's bbox to
    uniformly sampled point clouds before chamfer/EMD/F1
    (``run/test_atiss.py:198-225``);
  * MIME adds contact_labels with 1 on the human slot
    (``run/train_mime.py:62-65``).

TPU-first deviation: instead of the reference's per-scene dynamic
``num_obj`` slicing (bs locked to 1), box slots are padded to the dataset's
fixed 9 and masked out of attention (``valid_mask``) — statically shaped,
batchable, mathematically equivalent.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def boxes_from_batch(batch, num_classes: int, contact: bool = False) -> Dict:
    """Host-side batch -> ATISS box dict with padding mask."""
    import jax.numpy as jnp

    from lsdm_tpu.ops.geometry import translate_objs_to_bbox

    B, O, N, _ = batch.given_objs.shape
    flat = batch.given_objs.reshape(B * O, N, 3)
    translations, sizes = translate_objs_to_bbox(flat)
    translations = translations.reshape(B, O, 3)
    sizes = sizes.reshape(B, O, 3)
    # slot 0 (human) counts as a box; given objects per the mask
    valid = np.asarray(batch.mask).copy()
    valid[:, 0] = 1.0
    cats = np.asarray(batch.given_cats)
    if cats.shape[-1] < num_classes:  # input_dims = num_classes + 7 padding
        pad = np.zeros((B, O, num_classes - cats.shape[-1]), np.float32)
        cats = np.concatenate([cats, pad], axis=-1)
    boxes = {
        "class_labels": jnp.asarray(cats),
        "translations": jnp.asarray(translations),
        "sizes": jnp.asarray(sizes),
        "angles": jnp.zeros((B, O, 1)),
        "valid_mask": jnp.asarray(valid),
        "room_layout": jnp.ones((B, 1, 64, 64)),
        "class_labels_tr": jnp.ones((B, 1, num_classes)),
        "translations_tr": jnp.ones((B, 1, 3)),
        "sizes_tr": jnp.ones((B, 1, 3)),
        "angles_tr": jnp.ones((B, 1, 1)),
    }
    if contact:
        cl = np.zeros((B, O, 1), np.float32)
        cl[:, 0] = 1.0  # human slot carries contact (run/train_mime.py:63-64)
        boxes["contact_labels"] = jnp.asarray(cl)
    return boxes


def build_model(kind: str, num_classes: int, args=None):
    from lsdm_tpu.models.atiss import (
        MIME, AutoregressiveTransformer, AutoregressiveTransformerPE)

    input_dims = num_classes + 7  # reference run/train_atiss.py:289-291
    kw = {}
    if args is not None:
        # faithful torchvision extractors + the reference's transformer-axis
        # bug, for converted-checkpoint parity (models/atiss.py docstrings)
        kw = dict(
            feature_extractor_name=getattr(args, "feature_extractor", None)
            or "simple",
            freeze_bn=not getattr(args, "no_freeze_bn", False),
            torch_seq_axis_quirk=getattr(args, "torch_seq_axis_quirk", False),
        )
    if kind == "mime":
        return MIME(n_classes=input_dims, **kw), input_dims
    # reference networks/__init__.py:85 network_type
    # "autoregressive_transformer_pe" — the learned-slot-PE variant
    # (repaired; models/atiss.py:AutoregressiveTransformerPE)
    if kind == "atiss_pe" or getattr(args, "pe", False):
        return AutoregressiveTransformerPE(n_classes=input_dims, **kw), input_dims
    return AutoregressiveTransformer(n_classes=input_dims, **kw), input_dims


def train_baseline(args, kind: str):
    import jax
    import jax.numpy as jnp
    import optax

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state
    from lsdm_tpu.utils.logger import KVLogger

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    resolve_parity_flags(args)

    num_cats = cfg_lib.num_cats_for(args.datatype)
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    kw = {"objs_data_dir": args.objs_data_dir} if args.objs_data_dir else {}
    train_ds = ds_cls(args.train_data_dir, max_cats=num_cats, **kw)
    loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                        drop_last=True)

    model, input_dims = build_model(kind, num_cats, args)
    contact = kind == "mime"
    bridge = None
    if kind == "cf_atiss":
        # frozen-CF preprocessing; ATISS half is what trains
        bridge = _make_bridge(args, model, None, num_cats, input_dims)
    b0 = next(iter(loader))
    boxes0 = (
        bridge.make_boxes(b0.given_objs, b0.given_cats, b0.mask)
        if bridge is not None
        else boxes_from_batch(b0, input_dims, contact)
    )
    variables = model.init(jax.random.PRNGKey(args.seed), boxes0)
    tx = optax.adamw(args.lr, weight_decay=0.01)  # torch AdamW defaults
    state = create_train_state(variables, tx)
    logger = KVLogger(os.path.join(args.save_dir, "logs"))

    from lsdm_tpu.ops.geometry import translate_objs_to_bbox

    @jax.jit
    def step(state, boxes, gt_translation, gt_size, target_cat):
        def loss_fn(params):
            vs = {"params": params}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats  # frozen extractor stats
            out = model.apply(vs, boxes)
            pred_sizes = jnp.concatenate(
                [out.sizes_x, out.sizes_y, out.sizes_z], -1
            )[:, 0]
            pred_tr = jnp.concatenate(
                [out.translations_x, out.translations_y, out.translations_z], -1
            )[:, 0]
            logits = out.class_labels[:, 0]
            ce = -jnp.mean(
                jnp.take_along_axis(
                    jax.nn.log_softmax(logits, -1),
                    jnp.argmax(target_cat, -1)[:, None], 1,
                )
            )
            loss = (
                jnp.mean((pred_sizes - gt_size) ** 2)
                + jnp.mean((pred_tr - gt_translation) ** 2)
                + ce
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    os.makedirs(args.save_dir, exist_ok=True)
    best = float("inf")
    for epoch in range(args.epochs):
        total, n = 0.0, 0
        for batch in loader:
            if bridge is not None:
                boxes = bridge.make_boxes(batch.given_objs, batch.given_cats,
                                          batch.mask)
            else:
                boxes = boxes_from_batch(batch, input_dims, contact)
            gt_tr, gt_sz = translate_objs_to_bbox(batch.target_verts)
            state, loss = step(
                state, boxes, jnp.asarray(gt_tr), jnp.asarray(gt_sz),
                jnp.asarray(batch.target_cat),
            )
            total += float(loss)
            n += 1
        mean = total / max(n, 1)
        logger.log("train/loss", mean, step=epoch)
        print(f"epoch {epoch}: loss {mean:.4f}")
        if mean < best:
            best = mean
            ckpt_lib.save(os.path.join(args.save_dir, f"best_model_{kind}.ckpt"),
                          state, extra={"epoch": epoch, "loss": mean})
    ckpt_lib.save(os.path.join(args.save_dir, f"final_{kind}.ckpt"), state,
                  extra={"epoch": args.epochs - 1})
    return state


def eval_baseline(args, kind: str):
    import jax
    import jax.numpy as jnp

    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.data.dataset import DataLoader, Humanise, ProxDatasetTxt
    from lsdm_tpu.ops.geometry import oriented_bbox, translate_bbox_obj
    from lsdm_tpu.ops.metrics import emd as emd_fn, fscore, topk_accuracy
    from lsdm_tpu.ops.pointcloud import chamfer_distance
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    resolve_parity_flags(args)

    num_cats = cfg_lib.num_cats_for(args.datatype)
    ds_cls = ProxDatasetTxt if args.datatype == "proxd" else Humanise
    kw = {"objs_data_dir": args.objs_data_dir} if args.objs_data_dir else {}
    ds = ds_cls(args.data_dir, max_cats=num_cats, **kw)
    loader = DataLoader(ds, args.batch_size, shuffle=False)
    model, input_dims = build_model(kind, num_cats, args)
    contact = kind == "mime"

    b0 = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0), boxes_from_batch(b0, input_dims, contact)
    )
    state = create_train_state(variables, make_optimizer())
    if args.load_model and args.load_model.endswith(".pt"):
        # reference torch checkpoint ({'model_state_dict': ...},
        # run/train_atiss.py:333); resolve_parity_flags already defaulted
        # the graph to resnet18 + torch_seq_axis_quirk for faithful eval
        import torch

        ckpt = torch.load(args.load_model, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        params, batch_stats = ckpt_lib.convert_atiss_state_dict(
            {k: v.detach().cpu().numpy() for k, v in sd.items()})
        state = state.replace(params=params, batch_stats=batch_stats)
        print(f"converted torch checkpoint {args.load_model}")
    elif args.load_model:
        state, extra = ckpt_lib.load(args.load_model, state)
        print(f"loaded {args.load_model}: {extra}")

    bridge = None
    if kind == "cf_atiss":
        bridge = _make_bridge(args, model, state, num_cats, input_dims)

    def _apply(params, batch_stats, boxes):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        return model.apply(vs, boxes)

    apply = jax.jit(_apply)

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "predictions"), exist_ok=True)
    chs, emds, f1s, accs, top3s, lines = [], [], [], [], [], []
    for bi, batch in enumerate(loader):
        if bridge is not None:
            out = bridge(batch.given_objs, batch.given_cats, batch.mask)
        else:
            out = apply(state.params, state.batch_stats,
                        boxes_from_batch(batch, input_dims, contact))
        pred_sizes = np.asarray(
            jnp.concatenate([out.sizes_x, out.sizes_y, out.sizes_z], -1)
        )[:, 0]
        pred_tr = np.asarray(
            jnp.concatenate(
                [out.translations_x, out.translations_y, out.translations_z], -1
            )
        )[:, 0]
        logits = np.asarray(out.class_labels)[:, 0]
        nvalid = len(set(batch.seq_names))
        for i, seq in enumerate(batch.seq_names[:nvalid]):
            pred_pts = translate_bbox_obj(pred_tr[i], np.abs(pred_sizes[i]) + 1e-3,
                                          1024, seed=bi * 64 + i)
            c, _, e = oriented_bbox(batch.target_verts[i])
            gt_pts = translate_bbox_obj(c, e, 1024, seed=bi * 64 + i + 7)
            p = jnp.asarray(pred_pts)[None]
            g = jnp.asarray(gt_pts)[None]
            chs.append(float(chamfer_distance(p, g)))
            emds.append(emd_fn(p, g))
            f1s.append(float(fscore(p[0], g[0], 0.1)[0]))
            tcat = jnp.argmax(jnp.asarray(batch.target_cat[i]))[None]
            probs = jnp.asarray(logits[i][None, :num_cats])
            (top1,) = topk_accuracy(probs, tcat, (1,))
            (top3,) = topk_accuracy(probs, tcat, (3,))
            accs.append(float(top1) / 100)
            top3s.append(float(top3) / 100)
            lines.append(f"Chamfer distance for seq {seq}: {chs[-1]:.4f}")
            np.save(os.path.join(args.output_dir, "predictions", seq + ".npy"),
                    pred_pts)
    with open(os.path.join(args.output_dir, "results.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
        f.write(f"Final Chamfer distance: {np.mean(chs):.4f}\n")
        f.write(f"Final EMD: {np.mean(emds):.4f}\n")
        f.write(f"Final F1 score: {np.mean(f1s):.4f}\n")
        f.write(f"Category accuracy: {np.mean(accs):.4f}\n")
        f.write(f"Top 3 accuracy: {np.mean(top3s):.4f}\n")
    print(
        f"CFD {np.mean(chs):.4f} | EMD {np.mean(emds):.4f} | F1 {np.mean(f1s):.4f}"
        f" | acc {np.mean(accs):.4f} | top3 {np.mean(top3s):.4f}"
    )


def _make_bridge(args, atiss_model, atiss_state, num_cats: int, input_dims: int):
    """Assemble the ContactFormer->ATISS bridge (reference
    ``run/test_cf_atiss.py:131-146``)."""
    import jax
    import jax.numpy as jnp

    from lsdm_tpu.models.bridge import BridgeModel
    from lsdm_tpu.models.posa import POSADecoder
    from lsdm_tpu.ops.spiral import identity_spirals
    import numpy as np

    # Frozen POSA decoder over 655 sampled human points.  When no trained
    # ContactFormer checkpoint is given, a deterministic random-init decoder
    # is used (flagged) so the pipeline runs end to end.
    sp = identity_spirals(655)
    decoder = POSADecoder(spiral_indices=np.tile(sp, (1, 9)), no_obj_classes=8)
    z0 = jnp.zeros((1, 256))
    v0 = jnp.zeros((1, 655, 3))
    dec_vars = decoder.init(jax.random.PRNGKey(args.seed), z0, v0)
    if args.cf_ckpt:
        from lsdm_tpu.train import checkpoint as ckpt_lib

        print(f"loading ContactFormer POSA decoder from {args.cf_ckpt}")
        # stored as a params pytree under 'posa/decoder'
        import flax

        with open(args.cf_ckpt, "rb") as f:
            full = flax.serialization.msgpack_restore(f.read())
        dec_params = full.get("params", full)
        for k in ("posa", "decoder"):
            if k in dec_params:
                dec_params = dec_params[k]
        dec_vars = {"params": dec_params}

    posa_decode = jax.jit(lambda z, v: decoder.apply(dec_vars, z, v))

    if atiss_state is None:
        atiss_apply = None  # make_boxes-only usage (training path)
    else:
        def atiss_apply(boxes):
            vs = {"params": atiss_state.params}
            if atiss_state.batch_stats:
                vs["batch_stats"] = atiss_state.batch_stats
            return atiss_model.apply(vs, boxes)

    return BridgeModel(atiss_apply, posa_decode, args.datatype, input_dims,
                       seed=args.seed)


def make_arg_parser(train: bool):
    import argparse

    ap = argparse.ArgumentParser()
    if train:
        ap.add_argument("--train_data_dir", required=True)
        ap.add_argument("--epochs", type=int, default=100)
        ap.add_argument("--lr", type=float, default=1e-3)
        ap.add_argument("--save_dir", default="training_output")
    else:
        ap.add_argument("data_dir")
        ap.add_argument("--load_model", default=None)
        ap.add_argument("--output_dir", default="test_output")
    ap.add_argument("--cf_ckpt", default=None,
                    help="ContactFormer checkpoint for the cf_atiss bridge")
    ap.add_argument("--objs_data_dir", default=None)
    ap.add_argument("--datatype", default="proxd", choices=["proxd", "humanise"])
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--feature_extractor", default=None,
                    choices=["simple", "resnet18", "alexnet"],
                    help="room-layout extractor; default: resnet18 when "
                         "loading a torch .pt (the reference default, "
                         "networks/__init__.py:78), else simple")
    ap.add_argument("--no_freeze_bn", action="store_true",
                    help="train resnet18 BN live instead of frozen stats")
    ap.add_argument("--pe", action="store_true",
                    help="use the learned-slot-positional-embedding variant "
                         "(reference network_type autoregressive_transformer_pe"
                         ", repaired — models/atiss.py)")
    ap.add_argument("--torch_seq_axis_quirk", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="reproduce the LSDM fork's batch-axis attention; "
                         "default: on when loading a torch .pt (converted "
                         "LSDM baselines need it), else off")
    return ap


def resolve_parity_flags(args) -> None:
    """Make converted-checkpoint eval un-fumbleable: a reference ``.pt``
    silently produces wrong numbers unless the graph uses the torchvision
    resnet18 extractor and the LSDM fork's batch-axis attention quirk, so
    both default ON exactly when a ``.pt`` is being loaded.  Explicit flags
    always win (``--feature_extractor simple`` /
    ``--no-torch_seq_axis_quirk`` opt back out)."""
    loading_pt = bool(getattr(args, "load_model", None)
                      and args.load_model.endswith(".pt"))
    if args.feature_extractor is None:
        args.feature_extractor = "resnet18" if loading_pt else "simple"
        if loading_pt:
            print("auto: --feature_extractor resnet18 (torch checkpoint)")
    if args.torch_seq_axis_quirk is None:
        args.torch_seq_axis_quirk = loading_pt
        if loading_pt:
            print("auto: --torch_seq_axis_quirk (torch checkpoint)")
