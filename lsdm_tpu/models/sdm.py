"""SceneDiffusionModel — the multi-conditional denoiser.

Faithful TPU re-design of reference ``model/sdm.py:18-218``.  Differences
from the reference are *interface* only, never math:

  * Text encoding happens outside the jitted denoiser: ``__call__`` takes a
    precomputed ``text_emb`` (B, clip_dim) instead of raw strings (the
    reference runs a frozen fp16 CLIP inside forward, ``model/sdm.py:147``;
    frozen encoder => identical conditioning, and the text tower lives in
    :mod:`lsdm_tpu.models.text` where it can be jitted separately or cached
    per-dataset).
  * The category prediction and guiding points are *returned* (as a
    :class:`~lsdm_tpu.diffusion.gaussian.DenoiserOutput`) instead of stashed
    on ``self`` (``model/sdm.py:158,217``) — functional style required under
    jit.

Reference quirks replicated on purpose (they affect trained numerics):

  * the float 0/1 object mask is ADDED to cross-attention logits
    (``model/sdm.py:180-182`` — torch treats float masks as additive);
  * the (B, 3072, 9) -> (B, 9, 1024, 3) and (B,9,1024,3) -> (1024, 3, B, 9)
    reshapes at ``model/sdm.py:193,199`` scramble object/feature axes in
    row-major order rather than transposing; jnp.reshape after
    jnp.transpose reproduces torch's contiguous().view exactly;
  * ``OutputProcess`` ends in GELU (outputs bounded below at ~-0.17);
  * ``predict_cat`` ends in Softmax even though the loss applies
    log_softmax again.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.diffusion.gaussian import DenoiserOutput
from lsdm_tpu.models.common import MLP, InputProcess, OutputProcess, TimestepEmbedder
from lsdm_tpu.models.pointnet2 import PointNet2Backbone
from lsdm_tpu.models.posa import POSADecoderBackbone
from lsdm_tpu.ops.attention import TorchMultiheadAttention


class SceneDiffusionModel(nn.Module):
    cfg: SDMConfig
    # Optional NamedSharding for the flattened (B*max_objs, N, 3) cloud axis:
    # the backbone is embarrassingly parallel over clouds, so on a
    # ("data", "model") mesh we split this axis over BOTH mesh axes (see
    # lsdm_tpu.parallel.mesh.obj_sharding).
    obj_sharding: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, 3) noisy target points
        mask: jax.Array,  # (B, max_objs) float 0/1, slot 0 = human (stays 0)
        timesteps: jax.Array,  # (B,) int
        given_objs: jax.Array,  # (B, max_objs, N, 3), slot 0 = human
        given_cats: jax.Array,  # (B, max_objs, max_cats) one-hot
        text_emb: jax.Array,  # (B, clip_dim) frozen text features
        train: bool = False,
    ) -> DenoiserOutput:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, num_obj, num_points, xyz = given_objs.shape
        D = cfg.latent_dim

        # 1) timestep embedding (reference :141-142)
        emb_ts = TimestepEmbedder(D, dtype=dtype, name="embed_timestep")(timesteps)

        # 2) text embedding MLP (reference :52-59,145-154)
        enc_text = MLP(
            (cfg.clip_dim // 2, D * 2, D),
            ("gelu", "gelu", "gelu"),
            dtype=dtype,
            name="embed_text",
        )(text_emb.astype(jnp.float32))
        enc_text = enc_text[:, None, :]  # (B, 1, D)

        # 3) category head on detached text features (reference :68-76,157)
        out_cat = MLP(
            (D // 2, D // 4, cfg.max_cats),
            ("gelu", "gelu", "gelu"),
            dtype=dtype,
            name="predict_cat",
        )(jax.lax.stop_gradient(enc_text))
        out_cat = jax.nn.softmax(out_cat.astype(jnp.float32), axis=2)

        # 4) category embedding (reference :62-65,161)
        emb_cat = MLP((cfg.cat_emb,), ("gelu",), dtype=dtype, name="embed_cat")(
            given_cats
        )  # (B, num_obj, cat_emb)

        # 5) fuse time+text, upsample channel 1 -> num_points (reference :164-167)
        emb = jnp.concatenate([emb_ts, enc_text], axis=-1)  # (B, 1, 2D)
        emb = jnp.transpose(emb, (0, 2, 1))  # (B, 2D, 1)
        emb = MLP(
            (128, 512, cfg.pcd_points),
            ("gelu", "gelu", "gelu"),
            dtype=dtype,
            name="upsampling_layer",
        )(emb)  # (B, 2D, num_points)
        emb = jnp.transpose(emb, (0, 2, 1))  # (B, num_points, 2D)

        # 6) backbones (reference :173-177; selection :96-104)
        hm_in = jax.lax.stop_gradient(given_objs[:, 0])
        if cfg.human_backbone_type == "P2R":
            from lsdm_tpu.models.stgcn import STGCN

            hm_out = STGCN(
                joint_num=cfg.pcd_points,
                out_channels=cfg.pcd_points * cfg.xyz_dim,
                dtype=dtype,
                name="human_backbone",
            )(hm_in, train=train)
        else:
            hm_out = POSADecoderBackbone(
                vert_dims=cfg.vert_dims,
                pcd_points=cfg.pcd_points,
                dtype=dtype,
                name="human_backbone",
            )(hm_in)  # (B, N, 3)
        objs_flat = given_objs.reshape(B * num_obj, num_points, xyz)
        if self.obj_sharding is not None:
            objs_flat = jax.lax.with_sharding_constraint(objs_flat, self.obj_sharding)
        N = cfg.pcd_points
        if cfg.pcd_backbone_type == "DGCNN":
            from lsdm_tpu.models.dgcnn import DGCNN

            pcd_out = DGCNN(
                emb_dims=cfg.clip_dim,
                output_channels=cfg.pcd_points * cfg.xyz_dim,
                dtype=dtype,
                name="pcd_backbone",
            )(objs_flat, train=train)
        else:
            pcd_out = PointNet2Backbone(
                out_dim=cfg.pcd_dim,
                sa_npoints=(N, max(N // 4, 4), max(N // 16, 2), max(N // 64, 1)),
                sa_nsample=min(32, N),
                fps_mode=cfg.fps_mode,
                dtype=dtype,
                name="pcd_backbone",
            )(objs_flat, train=train)  # (B*num_obj, N, pcd_dim)
        pcd_out = pcd_out.reshape(B, num_obj, num_points * cfg.pcd_dim)

        # 7) text x cat x pcd cross attention (reference :79,180-182)
        attn_mask = jax.lax.stop_gradient(mask[:, None, :].astype(jnp.float32))
        attn_mask = jnp.tile(attn_mask, (cfg.n_head, 1, 1))  # (B*H, 1, num_obj)
        _, attn_w = TorchMultiheadAttention(
            embed_dim=D,
            num_heads=cfg.n_head,
            kdim=cfg.cat_emb,
            vdim=cfg.pcd_points * cfg.pcd_dim,
            dtype=dtype,
            name="attn_layer",
        )(enc_text, emb_cat, pcd_out, attn_mask=attn_mask)
        # attn_w: (B, 1, num_obj) head-averaged weights

        # 8) translation branch (reference :82-91,185-188)
        enc_text_rep = jnp.broadcast_to(enc_text, (B, num_obj, D))
        emb_cat2 = jnp.concatenate([emb_cat, enc_text_rep], axis=-1)
        translation = MLP(
            (D, cfg.translation_params),
            ("gelu", "gelu"),
            dtype=dtype,
            name="translation_layer",
        )(emb_cat2)  # (B, num_obj, T)
        translation = jnp.broadcast_to(
            translation[:, :, None, :], (B, num_obj, cfg.pcd_points, cfg.translation_params)
        ).reshape(B * num_obj, cfg.pcd_points, cfg.translation_params)

        # 9) attention-weighted features with the reference's exotic reshapes
        # (reference :191-203).  torch .reshape on a permuted tensor ==
        # row-major reshape of the transposed array.
        pcd_out = jnp.transpose(pcd_out, (0, 2, 1))  # (B, N*pcd_dim, num_obj)
        pcd_out = pcd_out * attn_w.astype(pcd_out.dtype)  # broadcast (B, 1, num_obj)
        pcd_out = pcd_out.reshape(B, num_obj, num_points, cfg.pcd_dim)  # scramble!
        pcd_trans = pcd_out.reshape(B * num_obj, cfg.pcd_points, cfg.xyz_dim)
        pcd_trans, _ = TorchMultiheadAttention(
            embed_dim=cfg.translation_params,
            num_heads=cfg.translation_params,
            kdim=cfg.xyz_dim,
            vdim=cfg.xyz_dim,
            dtype=dtype,
            name="pcd_attention",
        )(translation, pcd_trans, pcd_trans)
        pcd_trans = pcd_trans.reshape(B, num_obj, num_points, cfg.translation_params)
        pcd_out = jnp.concatenate([pcd_out, pcd_trans], axis=-1)
        pcd_out = MLP(
            (cfg.xyz_dim,), ("gelu",), dtype=dtype, name="point_wise_trans_layer"
        )(pcd_out)  # (B, num_obj, N, 3)
        pcd_out = pcd_out.reshape(num_points, -1, B, num_obj)  # scramble (:199)
        pcd_out = pcd_out * mask.astype(pcd_out.dtype)  # broadcast over (B, num_obj)
        pcd_out = pcd_out.reshape(B, num_obj, num_points, -1)
        pcd_out = pcd_out.sum(axis=1)  # (B, N, 3)
        pcd_out = (pcd_out + hm_out) / 2
        x = x + pcd_out  # (reference :204)

        # 10) final conditioning embedding (reference :117-122,208)
        emb = MLP((cfg.latent_dim,), ("gelu",), dtype=dtype, name="combine_extraction")(
            emb
        )  # (B, N, D)

        # 11) in/out process for the denoised cloud and guiding points
        # (reference :211-217)
        input_process = InputProcess(cfg.xyz_dim, D, dtype=dtype, name="input_process")
        output_process = OutputProcess(
            cfg.xyz_dim, D, cfg.pcd_points, dtype=dtype, name="output_process"
        )
        x = output_process(input_process(x, emb))
        guiding = output_process(input_process(pcd_out, emb))

        return DenoiserOutput(
            x0=x.astype(jnp.float32), cat=out_cat, guiding=guiding.astype(jnp.float32)
        )
