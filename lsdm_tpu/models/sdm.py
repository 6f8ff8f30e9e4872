"""SceneDiffusionModel — the multi-conditional denoiser.

Faithful TPU re-design of reference ``model/sdm.py:18-218``.  Differences
from the reference are *interface* only, never math:

  * Text encoding happens outside the jitted denoiser: ``__call__`` takes a
    precomputed ``text_emb`` (B, clip_dim) instead of raw strings (the
    reference runs a frozen fp16 CLIP inside forward, ``model/sdm.py:147``;
    frozen encoder => identical conditioning).
  * The category prediction and guiding points are *returned* (as a
    :class:`~lsdm_tpu.diffusion.gaussian.DenoiserOutput`) instead of stashed
    on ``self`` (``model/sdm.py:158,217``) — functional style under jit.
  * The forward factors into :meth:`encode_conditioning` (everything that
    depends only on (mask, objects, categories, text) — both backbones,
    both attentions, the translation branch) and :meth:`denoise_from_cond`
    (the only t/x_t-dependent part: timestep embedding, the upsampling MLP
    and the input/output processes).  During sampling the conditioning is
    computed ONCE and reused across all 1000 steps — the reference
    recomputes the full stack every step (``gaussian_diffusion.py:736``).
    ``__call__`` composes the two, so training and checkpoints see the
    exact reference graph.

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

from typing import NamedTuple, Optional

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


class CondCache(NamedTuple):
    """Conditioning features that are constant across sampler steps."""

    enc_text: jax.Array  # (B, 1, D)
    out_cat: jax.Array  # (B, 1, max_cats) softmax probs
    cond_pcd: jax.Array  # (B, N, 3) — (sum of weighted obj features + human)/2


class SceneDiffusionModel(nn.Module):
    cfg: SDMConfig
    # Optional NamedSharding for the flattened (B*max_objs, N, 3) cloud axis:
    # the backbone is embarrassingly parallel over clouds, so on a
    # ("data", "model") mesh we split this axis over BOTH mesh axes (see
    # lsdm_tpu.parallel.mesh.obj_sharding).
    obj_sharding: Optional[object] = None

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        D = cfg.latent_dim
        self.embed_timestep = TimestepEmbedder(D, dtype=dtype)
        self.embed_text = MLP(
            (cfg.clip_dim // 2, D * 2, D), ("gelu", "gelu", "gelu"), dtype=dtype
        )
        self.predict_cat = MLP(
            (D // 2, D // 4, cfg.max_cats), ("gelu", "gelu", "gelu"), dtype=dtype
        )
        self.embed_cat = MLP((cfg.cat_emb,), ("gelu",), dtype=dtype)
        self.upsampling_layer = MLP(
            (128, 512, cfg.pcd_points), ("gelu", "gelu", "gelu"), dtype=dtype
        )
        self.attn_layer = TorchMultiheadAttention(
            embed_dim=D, num_heads=cfg.n_head, kdim=cfg.cat_emb,
            vdim=cfg.pcd_points * cfg.pcd_dim, dtype=dtype,
        )
        self.translation_layer = MLP(
            (D, cfg.translation_params), ("gelu", "gelu"), dtype=dtype
        )
        self.point_wise_trans_layer = MLP((cfg.xyz_dim,), ("gelu",), dtype=dtype)
        self.pcd_attention = TorchMultiheadAttention(
            embed_dim=cfg.translation_params, num_heads=cfg.translation_params,
            kdim=cfg.xyz_dim, vdim=cfg.xyz_dim, dtype=dtype,
        )
        if cfg.human_backbone_type == "P2R":
            from lsdm_tpu.models.stgcn import STGCN

            self.human_backbone = STGCN(
                joint_num=cfg.pcd_points,
                out_channels=cfg.pcd_points * cfg.xyz_dim,
                dtype=dtype,
            )
        else:
            self.human_backbone = POSADecoderBackbone(
                vert_dims=cfg.vert_dims, pcd_points=cfg.pcd_points, dtype=dtype
            )
        N = cfg.pcd_points
        if cfg.pcd_backbone_type == "DGCNN":
            from lsdm_tpu.models.dgcnn import DGCNN

            self.pcd_backbone = DGCNN(
                emb_dims=cfg.clip_dim,
                output_channels=cfg.pcd_points * cfg.xyz_dim,
                dtype=dtype,
                select_impl="spmd" if self.obj_sharding is not None
                else "topk",
            )
        else:
            self.pcd_backbone = PointNet2Backbone(
                out_dim=cfg.pcd_dim,
                sa_npoints=(N, max(N // 4, 4), max(N // 16, 2), max(N // 64, 1)),
                sa_nsample=min(32, N),
                fps_mode=cfg.fps_mode,
                dtype=dtype,
                bn_dtype=jnp.dtype(cfg.bn_dtype),
                # sharded object axis -> partition-clean neighbour selection
                # (lax.top_k has no SPMD rule; see ops/pointcloud.py)
                select_impl="spmd" if self.obj_sharding is not None
                else "topk",
                # The Pallas kernels have no GSPMD partitioning rule.
                # Round 5: the per-cloud selection kernels ("pallas"
                # ball-query/3-NN/FPS) now run per-shard under
                # jax.shard_map when the batch divides the shard count
                # (parallel/mesh.py:cloud_shard_map; indivisible shapes
                # fall back to the partition-clean topk_p inside the
                # module).  The whole-stage eval "fused" and the
                # select+gather "sg" kernels still fall back to the
                # composed formulations under sharding (pinned by
                # tests/test_parallel.py midsize audits).
                ball_impl=("auto" if self.obj_sharding is not None
                           and cfg.ball_impl in ("fused", "sg")
                           else cfg.ball_impl),
                gather_bwd=cfg.gather_bwd,
                hoist_layer1=cfg.sa_hoist,
                fps_batched=cfg.fps_batched,
                shard=self.obj_sharding,
            )
        self.combine_extraction = MLP((D,), ("gelu",), dtype=dtype)
        self.input_process = InputProcess(cfg.xyz_dim, D, dtype=dtype)
        self.output_process = OutputProcess(
            cfg.xyz_dim, D, cfg.pcd_points, dtype=dtype
        )

    # ------------------------------------------------------------------
    def encode_conditioning(
        self,
        mask: jax.Array,  # (B, max_objs) float 0/1, slot 0 = human (stays 0)
        given_objs: jax.Array,  # (B, max_objs, N, 3), slot 0 = human
        given_cats: jax.Array,  # (B, max_objs, max_cats) one-hot
        text_emb: jax.Array,  # (B, clip_dim) frozen text features
        train: bool = False,
    ) -> CondCache:
        """Everything independent of (x_t, t): reference ``model/sdm.py``
        steps :145-161 (text/cat embeddings, category head) and
        :169-204 (backbones, both attentions, translation branch)."""
        cfg = self.cfg
        B, num_obj, num_points, xyz = given_objs.shape
        D = cfg.latent_dim

        # text embedding MLP (reference :52-59,145-154)
        enc_text = self.embed_text(text_emb.astype(jnp.float32))[:, None, :]

        # category head on detached text features (reference :68-76,157)
        out_cat = self.predict_cat(jax.lax.stop_gradient(enc_text))
        out_cat = jax.nn.softmax(out_cat.astype(jnp.float32), axis=2)

        # category embedding (reference :62-65,161)
        emb_cat = self.embed_cat(given_cats)  # (B, num_obj, cat_emb)

        # backbones (reference :173-177)
        hm_in = jax.lax.stop_gradient(given_objs[:, 0])
        if cfg.human_backbone_type == "P2R":
            hm_out = self.human_backbone(hm_in, train=train)
        else:
            hm_out = self.human_backbone(hm_in)  # (B, N, 3)
        objs_flat = given_objs.reshape(B * num_obj, num_points, xyz)
        if self.obj_sharding is not None:
            objs_flat = jax.lax.with_sharding_constraint(objs_flat, self.obj_sharding)
        pcd_out = self.pcd_backbone(objs_flat, train=train)
        pcd_out = pcd_out.reshape(B, num_obj, num_points * cfg.pcd_dim)

        # text x cat x pcd cross attention (reference :79,180-182)
        attn_mask = jax.lax.stop_gradient(mask[:, None, :].astype(jnp.float32))
        attn_mask = jnp.tile(attn_mask, (cfg.n_head, 1, 1))  # (B*H, 1, num_obj)
        _, attn_w = self.attn_layer(enc_text, emb_cat, pcd_out, attn_mask=attn_mask)

        # translation branch (reference :82-91,185-188)
        enc_text_rep = jnp.broadcast_to(enc_text, (B, num_obj, D))
        emb_cat2 = jnp.concatenate([emb_cat, enc_text_rep], axis=-1)
        translation = self.translation_layer(emb_cat2)  # (B, num_obj, T)
        translation = jnp.broadcast_to(
            translation[:, :, None, :],
            (B, num_obj, cfg.pcd_points, cfg.translation_params),
        ).reshape(B * num_obj, cfg.pcd_points, cfg.translation_params)

        # attention-weighted features with the reference's exotic reshapes
        # (reference :191-203).  torch .reshape on a permuted tensor ==
        # row-major reshape of the transposed array.
        pcd_out = jnp.transpose(pcd_out, (0, 2, 1))  # (B, N*pcd_dim, num_obj)
        pcd_out = pcd_out * attn_w.astype(pcd_out.dtype)
        pcd_out = pcd_out.reshape(B, num_obj, num_points, cfg.pcd_dim)  # scramble!
        pcd_trans = pcd_out.reshape(B * num_obj, cfg.pcd_points, cfg.xyz_dim)
        pcd_trans, _ = self.pcd_attention(
            translation, pcd_trans, pcd_trans,
            # head_dim=1 fused eval kernel: the (B*O, H, N, N) logits plane
            # (432 MB at batch 1, 3.5 GB at batch 8) never leaves VMEM.
            fused=(cfg.ball_impl == "fused" and not train),
            # train-time fused path: same forward kernel + a flash-style
            # custom-VJP backward (cfg.attn_impl, resolved by the train
            # CLIs)
            fused_train=(cfg.attn_impl == "pallas" and train),
            # sharded object axis: the kernels have no GSPMD rule, but
            # under shard_map they run per-shard with zero collectives
            # (round 5, ops/attn_pallas.py:rank1_mha_sharded); indivisible
            # shard counts fall back to composed inside the module
            shard=self.obj_sharding)
        pcd_trans = pcd_trans.reshape(B, num_obj, num_points, cfg.translation_params)
        pcd_out = jnp.concatenate([pcd_out, pcd_trans], axis=-1)
        pcd_out = self.point_wise_trans_layer(pcd_out)  # (B, num_obj, N, 3)
        pcd_out = pcd_out.reshape(num_points, -1, B, num_obj)  # scramble (:199)
        pcd_out = pcd_out * mask.astype(pcd_out.dtype)
        pcd_out = pcd_out.reshape(B, num_obj, num_points, -1)
        pcd_out = pcd_out.sum(axis=1)  # (B, N, 3)
        cond_pcd = (pcd_out + hm_out) / 2  # (reference :203)

        return CondCache(enc_text=enc_text, out_cat=out_cat, cond_pcd=cond_pcd)

    # ------------------------------------------------------------------
    def timestep_cond_emb(self, cond: CondCache, timesteps: jax.Array
                          ) -> jax.Array:
        """Per-point fused (timestep, text) embedding — depends only on
        ``(t, cond.enc_text)``, NOT on x_t (reference :141-142 timestep emb,
        :164-167 upsampling fuse).  Samplers exploit this by precomputing a
        (T, B, N, D) table outside the scan (``models/sampling.py``)."""
        emb_ts = self.embed_timestep(timesteps)  # (B, 1, D)
        emb = jnp.concatenate([emb_ts, cond.enc_text], axis=-1)  # (B, 1, 2D)
        emb = jnp.transpose(emb, (0, 2, 1))  # (B, 2D, 1)
        emb = self.upsampling_layer(emb)  # (B, 2D, N)
        emb = jnp.transpose(emb, (0, 2, 1))  # (B, N, 2D)
        return self.combine_extraction(emb)  # (B, N, D)

    def step_emb2(self, cond: CondCache, timesteps: jax.Array) -> jax.Array:
        """The (B, 2D) concat of timestep + text embeddings — the input of
        the upsampling MLP (reference :164-165 before the permute).  The
        fused-step sampler precomputes this per step outside the scan
        (ops/denoise_pallas.py); everything after it runs in-kernel."""
        emb_ts = self.embed_timestep(timesteps)  # (B, 1, D)
        return jnp.concatenate([emb_ts, cond.enc_text], axis=-1)[:, 0]

    def denoise_with_emb(self, cond: CondCache, emb: jax.Array, x: jax.Array
                         ) -> jax.Array:
        """x_t-dependent core (reference :204-212): the only work that truly
        belongs inside the sampling loop."""
        x = x + cond.cond_pcd  # (reference :204)
        return self.output_process(self.input_process(x, emb)).astype(
            jnp.float32)

    def guiding_from_emb(self, cond: CondCache, emb: jax.Array) -> jax.Array:
        """Guiding points (reference :213-217) — x_t-independent: in the
        sampler, only the final step's value is consumed, so it is computed
        once outside the loop."""
        return self.output_process(
            self.input_process(cond.cond_pcd, emb)).astype(jnp.float32)

    def denoise_from_cond(
        self,
        cond: CondCache,
        x: jax.Array,  # (B, N, 3) noisy target points
        timesteps: jax.Array,  # (B,) int
    ) -> DenoiserOutput:
        """The t/x_t-dependent tail: reference :141-142 (timestep emb),
        :164-167 (upsampling fuse), :204-217 (x += cond; in/out process;
        guiding points)."""
        emb = self.timestep_cond_emb(cond, timesteps)
        return DenoiserOutput(
            x0=self.denoise_with_emb(cond, emb, x),
            cat=cond.out_cat,
            guiding=self.guiding_from_emb(cond, emb),
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        timesteps: jax.Array,
        given_objs: jax.Array,
        given_cats: jax.Array,
        text_emb: jax.Array,
        train: bool = False,
    ) -> DenoiserOutput:
        cond = self.encode_conditioning(mask, given_objs, given_cats, text_emb,
                                        train=train)
        return self.denoise_from_cond(cond, x, timesteps)
