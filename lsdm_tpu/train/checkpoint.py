"""Checkpoint save/load + torch .pt state_dict conversion.

Native format: flax msgpack serialization of the TrainState pytree plus a
small JSON sidecar of metadata (epoch/losses), mirroring the reference's
``torch.save({'epoch', 'model_state_dict', ...})`` contract
(``run/train_sdm.py:294-337``).

``convert_torch_state_dict`` maps a reference ``model_state_dict`` (torch
tensor names) onto our flax param tree so released checkpoints can be
evaluated for CFD/F1 parity (BASELINE.md north star).  CLIP weights are
excluded exactly like the reference's ``load_model_wo_clip``
(``util/model_util.py:10-13``).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import serialization

from lsdm_tpu.train.state import TrainState


def save(path: str, state: TrainState, extra: Optional[dict] = None):
    data = serialization.to_bytes(state)
    with open(path, "wb") as f:
        f.write(data)
    if extra is not None:
        with open(path + ".json", "w") as f:
            json.dump(extra, f)


def save_orbax(directory: str, state: TrainState, step: int):
    """Orbax-backed checkpointing for large-scale / multi-host training
    (async, sharded-array aware).  The msgpack format above stays the
    default for single-host parity workflows."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def load_orbax(directory: str, step: int, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    return ckptr.restore(path, template)


def load(path: str, template: TrainState) -> Tuple[TrainState, dict]:
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    extra = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extra = json.load(f)
    return state, extra


# ---------------------------------------------------------------------------
# torch -> flax conversion


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


def _seq_path(torch_key: str) -> Tuple[str, ...]:
    """torch ``a.0.weight`` -> ("a", "0", "weight") keeping numeric names."""
    return tuple(torch_key.split("."))


def convert_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    max_cats: int = 13,
) -> Tuple[Dict, Dict]:
    """Convert a reference SDM ``model_state_dict`` to (params, batch_stats).

    Accepts a dict of numpy arrays (call ``{k: v.numpy() for k, v in
    torch.load(...)['model_state_dict'].items()}`` first; torch itself is
    not imported here).

    Layout notes:
      * our Linears keep torch layout (out, in) -> direct copy;
      * flax Dense (used in the PointNet++ backbone) wants (in, out) and the
        torch side is Conv1d/2d with trailing 1x1 dims -> squeeze + T;
      * GroupNorm/LayerNorm/BatchNorm: weight->scale, bias->bias;
      * BatchNorm running stats -> the ``batch_stats`` collection;
      * torch Sequential indices map to our "0"/"2"/... TorchLinear names;
      * ``clip_model.*`` / text-tower keys are skipped (frozen encoder is
        external, util/model_util.py:10-13 behavior).
    """
    params: Dict = {}
    batch_stats: Dict = {}

    # pcd_backbone structural tables: torch module names -> ours
    sa_re = re.compile(r"pcd_backbone\.(sa\d)\.mlp_(convs|bns)\.(\d)\.(.+)")
    fp_re = re.compile(r"pcd_backbone\.(fp\d)\.mlp_(convs|bns)\.(\d)\.(.+)")
    head_conv_re = re.compile(r"pcd_backbone\.conv1\.(.+)")
    head_bn_re = re.compile(r"pcd_backbone\.bn1\.(.+)")
    out_conv_re = re.compile(r"pcd_backbone\.conv2\.(.+)")

    def conv_to_dense(v: np.ndarray) -> np.ndarray:
        # Conv2d (out, in, 1, 1) / Conv1d (out, in, 1) -> Dense kernel (in, out)
        v = np.asarray(v)
        v = v.reshape(v.shape[0], v.shape[1])
        return v.T

    def put_bn(prefix: Tuple[str, ...], leaf: str, v: np.ndarray):
        v = np.asarray(v)
        if leaf == "weight":
            _set(params, prefix + ("scale",), v)
        elif leaf == "bias":
            _set(params, prefix + ("bias",), v)
        elif leaf == "running_mean":
            _set(batch_stats, prefix + ("mean",), v)
        elif leaf == "running_var":
            _set(batch_stats, prefix + ("var",), v)
        # num_batches_tracked dropped

    for key, val in state_dict.items():
        v = np.asarray(val)
        if key.startswith("clip_model.") or key.startswith("text_encoder_model."):
            continue
        if key.startswith("sequence_pos_encoder."):
            continue  # fixed sinusoidal table, not a parameter here

        # --- timestep embedder
        m = re.match(r"embed_timestep\.time_embed\.(\d)\.(weight|bias)", key)
        if m:
            _set(params, ("embed_timestep", f"time_embed_{m.group(1)}", m.group(2)), v)
            continue

        # --- plain sequential MLPs kept under the same names
        m = re.match(
            r"(embed_text|predict_cat|embed_cat|translation_layer|"
            r"point_wise_trans_layer|upsampling_layer|combine_extraction)"
            r"\.(\d+)\.(weight|bias)",
            key,
        )
        if m:
            _set(params, (m.group(1), m.group(2), m.group(3)), v)
            continue

        # --- attentions
        m = re.match(r"(attn_layer|pcd_attention)\.(q_proj_weight|k_proj_weight|"
                     r"v_proj_weight|in_proj_bias)", key)
        if m:
            _set(params, (m.group(1), m.group(2)), v)
            continue
        m = re.match(r"(attn_layer|pcd_attention)\.out_proj\.(weight|bias)", key)
        if m:
            _set(params, (m.group(1), "out_proj", m.group(2)), v)
            continue

        # --- input/output process
        m = re.match(
            r"input_process\.(pose_embedding|combination_extraction)\.(\d)\.(weight|bias)",
            key,
        )
        if m:
            _set(params, ("input_process", m.group(1), m.group(2), m.group(3)), v)
            continue
        m = re.match(r"output_process\.pose_final\.(\d)\.(weight|bias)", key)
        if m:
            _set(params, ("output_process", "pose_final", m.group(1), m.group(2)), v)
            continue

        # --- human backbone (POSA decoder): de_spiral.N.{conv.layer|layer|norm}
        m = re.match(r"human_backbone\.de_spiral\.(\d)\.conv\.layer\.(weight|bias)", key)
        if m:
            # GraphLin_block and Spiral_block both nest the linear as
            # conv.layer (posa_models.py:114-187); our flax blocks mirror
            # that nesting so this single rule covers both.
            _set(params, ("human_backbone", f"de_spiral_{m.group(1)}", "conv",
                          "layer", m.group(2)), v)
            continue
        m = re.match(r"human_backbone\.de_spiral\.(\d)\.layer\.(weight|bias)", key)
        if m:  # final bare SpiralConv
            _set(params, ("human_backbone", f"de_spiral_{m.group(1)}", "layer",
                          m.group(2)), v)
            continue
        m = re.match(r"human_backbone\.de_spiral\.(\d)\.norm\.(weight|bias)", key)
        if m:
            leaf = "scale" if m.group(2) == "weight" else "bias"
            _set(params, ("human_backbone", f"de_spiral_{m.group(1)}", "norm", leaf), v)
            continue

        # --- pcd backbone
        m = sa_re.match(key) or fp_re.match(key)
        if m:
            block, kind, idx, leaf = m.groups()
            ours = (block, f"mlp_{idx}")
            if kind == "convs":
                if leaf == "weight":
                    _set(params, ("pcd_backbone",) + ours + ("conv", "kernel"),
                         conv_to_dense(v))
                else:
                    _set(params, ("pcd_backbone",) + ours + ("conv", "bias"), v)
            else:  # bns
                put_bn(("pcd_backbone",) + ours + ("bn",), leaf, v)
            continue
        m = head_conv_re.match(key)
        if m:
            leaf = m.group(1)
            if leaf == "weight":
                _set(params, ("pcd_backbone", "head", "conv", "kernel"), conv_to_dense(v))
            elif leaf == "bias":
                _set(params, ("pcd_backbone", "head", "conv", "bias"), v)
            continue
        m = head_bn_re.match(key)
        if m:
            put_bn(("pcd_backbone", "head", "bn"), m.group(1), v)
            continue
        m = out_conv_re.match(key)
        if m:
            leaf = m.group(1)
            if leaf == "weight":
                _set(params, ("pcd_backbone", "conv2", "kernel"), conv_to_dense(v))
            elif leaf == "bias":
                _set(params, ("pcd_backbone", "conv2", "bias"), v)
            continue

        raise KeyError(f"unmapped reference parameter: {key} {v.shape}")

    # torch BN moving stats live per ConvBNBlock under name "bn"
    return params, batch_stats


def convert_clip_text(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """Convert a torch CLIP *text tower* state_dict to our flax
    :class:`lsdm_tpu.models.text.CLIPTextTransformer` params.

    Accepts either naming scheme (dict of numpy arrays):
      * OpenAI ``clip`` package (what the reference loads,
        ``model/sdm.py:266-277``): ``transformer.resblocks.N.attn.*``,
        ``token_embedding.weight``, ``positional_embedding``, ``ln_final``,
        ``text_projection`` — optionally prefixed ``clip_model.`` as saved
        inside an SDM checkpoint.
      * HuggingFace ``CLIPTextModelWithProjection``:
        ``text_model.encoder.layers.N.self_attn.{q,k,v}_proj.*`` (fused into
        one in_proj), ``text_projection.weight`` (transposed).

    Vision-tower / logit-scale keys are ignored.
    """
    params: Dict = {}
    hf_qkv: Dict[str, Dict[str, np.ndarray]] = {}

    def ln(prefix: Tuple[str, ...], leaf: str, v):
        _set(params, prefix + ("scale" if leaf == "weight" else "bias",), v)

    for key, val in state_dict.items():
        if key.startswith("clip_model."):
            key = key[len("clip_model."):]
        v = np.asarray(val, np.float32)
        if key.startswith("visual.") or key in ("logit_scale",):
            continue
        if key.startswith("text_model.embeddings.position_ids"):
            continue  # buffer, not a parameter

        # --- OpenAI naming
        if key == "token_embedding.weight":
            _set(params, ("token_embedding",), v)
            continue
        if key == "positional_embedding":
            _set(params, ("positional_embedding",), v)
            continue
        if key == "text_projection":
            _set(params, ("text_projection",), v)  # stored (width, embed)
            continue
        m = re.match(r"ln_final\.(weight|bias)", key)
        if m:
            ln(("ln_final",), m.group(1), v)
            continue
        m = re.match(
            r"transformer\.resblocks\.(\d+)\.(ln_1|ln_2)\.(weight|bias)", key
        )
        if m:
            ln((f"resblock_{m.group(1)}", m.group(2)), m.group(3), v)
            continue
        m = re.match(
            r"transformer\.resblocks\.(\d+)\.attn\.(in_proj_weight|in_proj_bias)",
            key,
        )
        if m:
            _set(params, (f"resblock_{m.group(1)}", "attn", m.group(2)), v)
            continue
        m = re.match(
            r"transformer\.resblocks\.(\d+)\.attn\.out_proj\.(weight|bias)", key
        )
        if m:
            _set(params, (f"resblock_{m.group(1)}", "attn", "out_proj",
                          m.group(2)), v)
            continue
        m = re.match(
            r"transformer\.resblocks\.(\d+)\.mlp\.(c_fc|c_proj)\.(weight|bias)",
            key,
        )
        if m:
            _set(params, (f"resblock_{m.group(1)}", f"mlp_{m.group(2)}",
                          m.group(3)), v)
            continue

        # --- HuggingFace naming
        if key == "text_model.embeddings.token_embedding.weight":
            _set(params, ("token_embedding",), v)
            continue
        if key == "text_model.embeddings.position_embedding.weight":
            _set(params, ("positional_embedding",), v)
            continue
        if key == "text_projection.weight":
            _set(params, ("text_projection",), v.T)  # torch Linear (out, in)
            continue
        m = re.match(r"text_model\.final_layer_norm\.(weight|bias)", key)
        if m:
            ln(("ln_final",), m.group(1), v)
            continue
        m = re.match(
            r"text_model\.encoder\.layers\.(\d+)\.(layer_norm1|layer_norm2)"
            r"\.(weight|bias)",
            key,
        )
        if m:
            which = "ln_1" if m.group(2) == "layer_norm1" else "ln_2"
            ln((f"resblock_{m.group(1)}", which), m.group(3), v)
            continue
        m = re.match(
            r"text_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj"
            r"\.(weight|bias)",
            key,
        )
        if m:
            hf_qkv.setdefault(m.group(1), {})[m.group(2) + m.group(3)] = v
            continue
        m = re.match(
            r"text_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj"
            r"\.(weight|bias)",
            key,
        )
        if m:
            _set(params, (f"resblock_{m.group(1)}", "attn", "out_proj",
                          m.group(2)), v)
            continue
        m = re.match(
            r"text_model\.encoder\.layers\.(\d+)\.mlp\.(fc1|fc2)\.(weight|bias)",
            key,
        )
        if m:
            which = "mlp_c_fc" if m.group(2) == "fc1" else "mlp_c_proj"
            _set(params, (f"resblock_{m.group(1)}", which, m.group(3)), v)
            continue

        raise KeyError(f"unmapped CLIP parameter: {key} {v.shape}")

    # fuse HF per-projection q/k/v into torch-style in_proj
    for layer, d in hf_qkv.items():
        _set(params, (f"resblock_{layer}", "attn", "in_proj_weight"),
             np.concatenate([d["qweight"], d["kweight"], d["vweight"]], 0))
        _set(params, (f"resblock_{layer}", "attn", "in_proj_bias"),
             np.concatenate([d["qbias"], d["kbias"], d["vbias"]], 0))
    return params


def convert_atiss_state_dict(
    state_dict: Dict[str, "np.ndarray"],
) -> Tuple[Dict, Dict]:
    """Convert a reference ATISS / MIME torch ``state_dict`` to
    (params, batch_stats) for :class:`lsdm_tpu.models.atiss.AutoregressiveTransformer`.

    Covers the full released-checkpoint surface
    (``atiss/scene_synthesis/networks/``):

      * ``transformer_encoder.layers.N.*`` (torch ``nn.TransformerEncoderLayer``)
        -> our ``layer_N`` (same math, same layout);
      * ``feature_extractor._feature_extractor.*`` — torchvision ResNet18
        (incl. FrozenBatchNorm stats, kept verbatim: the eps fold happened at
        freeze time, ``frozen_batchnorm.py:38``) or AlexNet;
      * ``hidden2output.*`` chained DMLL property heads
        (``hidden_to_output.py:53-115``);
      * token embeddings / projections.  ``start_token_embedding`` is skipped:
        it is registered but never used by any forward path
        (``autoregressive_transformer.py:25-28``).

    Conv weights stay in torch (out, in, kh, kw) layout — our
    :class:`~lsdm_tpu.models.feature_extractors.TorchConv` stores them
    verbatim.  Linears likewise (TorchLinear).
    """
    params: Dict = {}
    batch_stats: Dict = {}

    def put_bn(prefix: Tuple[str, ...], leaf: str, v: np.ndarray):
        if leaf == "weight":
            _set(params, prefix + ("scale",), v)
        elif leaf == "bias":
            _set(params, prefix + ("bias",), v)
        elif leaf == "running_mean":
            _set(batch_stats, prefix + ("mean",), v)
        elif leaf == "running_var":
            _set(batch_stats, prefix + ("var",), v)
        # num_batches_tracked dropped

    for key, val in state_dict.items():
        v = np.asarray(val, np.float32)

        if key == "start_token_embedding":
            continue  # registered but unused (autoregressive_transformer.py:25-28)
        if key in ("empty_token_embedding", "positional_embedding"):
            _set(params, (key,), v)
            continue
        m = re.match(r"(fc_room_f|fc)\.(weight|bias)", key)
        if m:
            _set(params, (m.group(1), m.group(2)), v)
            continue
        m = re.match(r"(fc_class|contact_fc)\.weight", key)
        if m:
            _set(params, (m.group(1), "weight"), v)
            continue

        # --- transformer encoder (torch nn.TransformerEncoderLayer names)
        m = re.match(
            r"transformer_encoder\.layers\.(\d+)\.self_attn\."
            r"(in_proj_weight|in_proj_bias)", key)
        if m:
            _set(params, (f"layer_{m.group(1)}", m.group(2)), v)
            continue
        m = re.match(
            r"transformer_encoder\.layers\.(\d+)\.self_attn\.out_proj\."
            r"(weight|bias)", key)
        if m:
            _set(params, (f"layer_{m.group(1)}", "attn_out_proj", m.group(2)), v)
            continue
        m = re.match(
            r"transformer_encoder\.layers\.(\d+)\.(linear1|linear2)\."
            r"(weight|bias)", key)
        if m:
            _set(params, (f"layer_{m.group(1)}", m.group(2), m.group(3)), v)
            continue
        m = re.match(
            r"transformer_encoder\.layers\.(\d+)\.(norm1|norm2)\.(weight|bias)",
            key)
        if m:
            leaf = "scale" if m.group(3) == "weight" else "bias"
            _set(params, (f"layer_{m.group(1)}", m.group(2), leaf), v)
            continue

        # --- DMLL head
        m = re.match(r"hidden2output\.(class_layer|fc_class_labels)\.(weight|bias)",
                     key)
        if m:
            _set(params, ("hidden2output", m.group(1), m.group(2)), v)
            continue
        m = re.match(
            r"hidden2output\.(centroid_layer_[xyz]|angle_layer|size_layer_[xyz])"
            r"\.(\d)\.(weight|bias)", key)
        if m:
            _set(params, ("hidden2output", m.group(1), m.group(2), m.group(3)), v)
            continue
        m = re.match(r"hidden2output\.hidden2output\.(\d)\.(weight|bias)", key)
        if m:  # with_extra_fc pre-head MLP (hidden_to_output.py:23-29)
            _set(params, ("hidden2output", "hidden2output", m.group(1),
                          m.group(2)), v)
            continue

        # --- feature extractor (torchvision resnet18 / alexnet surgery)
        fe = "feature_extractor._feature_extractor."
        if key.startswith(fe):
            sub = key[len(fe):]
            m = re.match(r"conv1\.weight", sub)
            if m:
                _set(params, ("feature_extractor", "conv1", "weight"), v)
                continue
            m = re.match(r"bn1\.(.+)", sub)
            if m:
                put_bn(("feature_extractor", "bn1"), m.group(1), v)
                continue
            m = re.match(r"(layer\d)\.(\d)\.(conv1|conv2)\.weight", sub)
            if m:
                _set(params, ("feature_extractor", f"{m.group(1)}_{m.group(2)}",
                              m.group(3), "weight"), v)
                continue
            m = re.match(r"(layer\d)\.(\d)\.(bn1|bn2)\.(.+)", sub)
            if m:
                put_bn(("feature_extractor", f"{m.group(1)}_{m.group(2)}",
                        m.group(3)), m.group(4), v)
                continue
            m = re.match(r"(layer\d)\.(\d)\.downsample\.0\.weight", sub)
            if m:
                _set(params, ("feature_extractor", f"{m.group(1)}_{m.group(2)}",
                              "downsample_0", "weight"), v)
                continue
            m = re.match(r"(layer\d)\.(\d)\.downsample\.1\.(.+)", sub)
            if m:
                put_bn(("feature_extractor", f"{m.group(1)}_{m.group(2)}",
                        "downsample_1"), m.group(3), v)
                continue
            m = re.match(r"fc\.(\d)\.(weight|bias)", sub)
            if m:  # replaced resnet fc: Sequential(Linear,ReLU,Linear)
                _set(params, ("feature_extractor", f"fc_{m.group(1)}",
                              m.group(2)), v)
                continue
            m = re.match(r"features\.(\d+)\.(weight|bias)", sub)
            if m:  # alexnet conv stack
                _set(params, ("feature_extractor", f"features_{m.group(1)}",
                              m.group(2)), v)
                continue
            if sub.startswith(("avgpool", "classifier")):
                continue  # parameter-free / unused alexnet classifier
            raise KeyError(f"unmapped feature-extractor parameter: {key} {v.shape}")
        m = re.match(r"feature_extractor\._fc\.(weight|bias)", key)
        if m:  # alexnet head (feature_extractors.py:69)
            _set(params, ("feature_extractor", "fc", m.group(1)), v)
            continue

        raise KeyError(f"unmapped ATISS parameter: {key} {v.shape}")

    return params, batch_stats


def load_torch_checkpoint(path: str, max_cats: int = 13):
    """Load a reference ``.pt`` checkpoint file (requires torch on host)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, batch_stats = convert_torch_state_dict(np_sd, max_cats=max_cats)
    extra = {k: v for k, v in ckpt.items() if not hasattr(v, "detach")}
    return params, batch_stats, extra
