"""Unified configuration for lsdm_tpu.

The reference scatters configuration over four mechanisms (argparse,
hard-coded dicts in ``util/model_util.py:26-125``, YAML for ATISS, python
constants in ``config.py``).  Here everything is a frozen dataclass with
presets that mirror the reference's canonical hyper-parameters exactly:

  * model presets  -> reference ``util/model_util.py:26-73``
    (``get_default_model_proxd`` / ``get_default_model_humanise``)
  * diffusion preset -> reference ``util/model_util.py:127-163``
    (steps=1000, cosine schedule, predict x_start, FIXED_SMALL sigma,
    lambda_cat=0.1)
  * fitting preset -> reference ``config.py:1-46``
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SDMConfig:
    """SceneDiffusionModel hyper-parameters.

    Mirrors the ctor defaults of reference ``model/sdm.py:19-22`` overridden
    by ``util/model_util.py:26-73``.
    """

    seq_len: int = 256
    modality: str = "text"
    clip_dim: int = 512
    dropout: float = 0.1
    n_layer: int = 6
    n_head: int = 8
    f_vert: int = 64
    dim_ff: int = 512
    cat_emb: int = 32
    latent_dim: int = 128
    cond_mask_prob: float = 1.0
    vert_dims: int = 655
    obj_cat: int = 8
    data_rep: str = "rot6d"
    njoints: int = 251
    pcd_points: int = 1024
    # Reference default is pcd_dim=128 (sdm.py:21) but the canonical configs
    # set pcd_dim=3 (model_util.py:41); pcd backbone emits (N, pcd_dim).
    pcd_dim: int = 3
    xyz_dim: int = 3
    max_cats: int = 13
    translation_params: int = 12
    max_objs: int = 9  # 8 scene objects + slot 0 = human (posa/dataset.py:456)
    pcd_backbone_type: str = "PNT2"  # "PNT2" | "DGCNN"
    human_backbone_type: str = "POSA"  # "POSA" | "P2R"
    text_encoder_type: str = "CLIP"  # "CLIP" | "BERT" | "HASH" | "CACHED"
    clip_version: str = "ViT-B/32"
    # FPS policy in the PointNet++ backbone: "auto" skips the sequential
    # selection scan when it would select all points anyway (sa1 at N=1024);
    # "exact" always runs the reference's sequential loop.
    fps_mode: str = "auto"
    # Compute dtype for the denoiser body (params stay fp32).
    dtype: str = "float32"
    # BatchNorm compute dtype in the PointNet++ backbone ("float32" or
    # "bfloat16").  fp32 matches reference numerics; bf16 halves the HBM
    # traffic of the grouped-buffer BN boundaries (train-mode batch
    # reductions force materialization) — see PERF.md.
    bn_dtype: str = "float32"
    # VJP formulation for the PointNet++ grouping gather: "scatter" is the
    # exact (and trace-identical) default; "matmul" computes the backward
    # segment-sum as a one-hot MXU contraction — much faster than XLA's
    # serialized scatter-add at training shapes (PERF.md round 3).
    # Forward numerics are bit-identical either way; only grads differ
    # (bf16-grade).  Training CLIs/benches opt into "matmul".
    gather_bwd: str = "scatter"
    # Ball-query formulation: "auto" derives it from the execution context
    # (TopK custom call on one chip, the partitioned top_k "topk_p" when
    # the object axis is sharded); "topk" / "topk_p" / "topk2" / "topk2c"
    # / "pallas" / "scatter" / "binsearch" force one
    # (ops/pointcloud.py:query_ball_point); "sg" fuses ball query + gather
    # + center-relative xyz into one train-legal Pallas kernel with a
    # custom VJP (ops/sg_fused_pallas.py); "fused" is the eval-only
    # whole-stage kernel family.
    ball_impl: str = "auto"
    # Train-time pcd_attention formulation: "xla" materializes the
    # (B*objs, 12, N, N) logits/weights planes in HBM fwd+bwd; "pallas"
    # runs the fused rank-1 kernel with a flash-style custom VJP
    # (ops/attn_pallas.py:rank1_mha_train) — no (N, N) plane in HBM
    # either direction.  Training CLIs resolve "auto" to "pallas" on a
    # TPU backend (models/sampling.py:resolve_train_attn_impl); sharded-
    # object contexts fall back to "xla" inside the model (no SPMD rule).
    # Eval fusion is separately controlled by ball_impl == "fused".
    attn_impl: str = "xla"
    # Hoist each SA stage's layer-1 Dense from the grouped (S*K) domain
    # to the N point domain (round 5, models/pointnet2.py:
    # PointNetSetAbstraction.hoist_layer1): 8-32x fewer layer-1 FLOPs
    # and one grouped buffer eliminated per stage, bf16-grade
    # reassociation deltas only.  Measured train-time NEGATIVE on TPU
    # (-12% reproduced: the layer-1 preactivation is WIDER than the
    # grouped input at sa1, so gather HBM bytes rise on a bandwidth-
    # bound step — PERF.md round 5).  Off by default; --sa_hoist opts in.
    sa_hoist: bool = False
    # Batch-parallel FPS kernel (ops/fps_batched_pallas.py): one kernel
    # advances all B*objs clouds per iteration instead of one grid cell
    # per cloud (grid cells execute sequentially on the TensorCore), so
    # the selection pays npoint loop overheads instead of B*npoint.
    # Bit-identical indices.  Applies wherever the Pallas FPS would run
    # (unsharded contexts); opt in via --fps_batched on the train CLIs.
    fps_batched: bool = False


def sdm_proxd() -> SDMConfig:
    """PRO-teXt preset (reference ``get_default_model_proxd``)."""
    return SDMConfig(max_cats=13)


def sdm_humanise() -> SDMConfig:
    """HUMANISE preset (reference ``get_default_model_humanise``)."""
    return SDMConfig(max_cats=11)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion process settings (reference ``util/model_util.py:127-163``)."""

    steps: int = 1000
    noise_schedule: str = "cosine"  # "cosine" | "linear"
    scale_beta: float = 1.0
    predict_xstart: bool = True  # ModelMeanType.START_X
    sigma_small: bool = True  # ModelVarType.FIXED_SMALL
    learn_sigma: bool = False
    rescale_timesteps: bool = False
    timestep_respacing: str = ""  # "" -> identity; "ddimN" / "N" supported
    lambda_cat: float = 0.1
    lambda_fc: float = 0.0
    lambda_rcxyz: float = 0.0
    lambda_vel: float = 0.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop settings (reference ``run/train_sdm.py:186-337``)."""

    batch_size: int = 6
    lr: float = 1e-3
    # torch AdamW's default weight_decay, which the reference silently uses
    # (run/train_sdm.py:42-43 passes only lr).
    weight_decay: float = 0.01
    epochs: int = 1000
    eval_every: int = 50  # validate + checkpoint cadence
    schedule_sampler: str = "uniform"  # "uniform" | "loss-second-moment"
    ema_rate: float = 0.0  # parameter EMA (0 = off)
    lr_anneal_steps: int = 0  # linear LR anneal horizon (0 = constant)
    # K optimizer steps per device dispatch (lax.scan over K stacked
    # batches, trainer.make_scan_train_step). 1 = one dispatch per step.
    # On the tunneled axon chip each dispatch costs ~28 ms of transport
    # (PERF.md), so K>1 is how the production loop reaches the measured
    # bench_train numbers (which amortize 20x).
    steps_per_dispatch: int = 1
    seed: int = 0
    bf16_compute: bool = True
    # Mesh axes: data-parallel x model-parallel. (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)
    ckpt_dir: str = "checkpoints"
    log_dir: str = "logs"


@dataclasses.dataclass(frozen=True)
class FittingConfig:
    """Object-fitting hyper-parameters (reference ``config.py:1-46``)."""

    voxel_size: float = 0.04
    cluster_min_points: int = 9
    pts_per_unit: int = 20
    contact_weight: float = 100.0
    pen_thresh: float = 0.0
    lr: float = 3e-3
    opt_steps: int = 200
    grid_rotations: int = 36
    grid_translations: int = 11  # 11 x 11 grid
    # Per-class DBSCAN eps (reference config.py cluster_eps table).
    default_cluster_eps: float = 0.1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset layout (reference ``posa/dataset.py:348-474``)."""

    data_dir: str = "data/protext/proxd_train"
    objs_dir: str = "data/protext/objs"
    datatype: str = "proxd"  # "proxd" | "humanise"
    max_objs: int = 8  # + 1 human slot
    pnt_size: int = 1024
    max_cats: int = 13
    fix_orientation: bool = False
    jump_step: int = 8
    max_frame: int = 220


# Category tables (reference ``posa/dataset.py:404-422`` / ``:533-548``).
PROXD_CATEGORIES = {
    "chair": 1,
    "table": 2,
    "cabinet": 3,
    "sofa": 4,
    "bed": 5,
    "chest_of_drawers": 6,
    "chest": 6,
    "stool": 7,
    "tv_monitor": 8,
    "tv": 8,
    "lighting": 9,
    "shelving": 10,
    "seating": 11,
    "furniture": 12,
    "human": 0,
}

HUMANISE_CATEGORIES = {
    "bed": 1,
    "sofa": 2,
    "table": 3,
    "door": 4,
    "desk": 5,
    "refrigerator": 6,
    "chair": 7,
    "counter": 8,
    "bookshelf": 9,
    "cabinet": 10,
    "human": 0,
}


def categories_for(datatype: str) -> dict:
    return PROXD_CATEGORIES if datatype == "proxd" else HUMANISE_CATEGORIES


def num_cats_for(datatype: str) -> int:
    return 13 if datatype == "proxd" else 11
