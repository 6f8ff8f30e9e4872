"""Checkpoint save/load roundtrip + torch state_dict conversion rules."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lsdm_tpu.train import checkpoint as ckpt_lib
from lsdm_tpu.train.state import create_train_state, make_optimizer


def _tiny_state():
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    tx = make_optimizer()
    return create_train_state({"params": params, "batch_stats": {}}, tx), tx


def test_save_load_roundtrip(tmp_path):
    state, _ = _tiny_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "m.ckpt")
    ckpt_lib.save(p, state, extra={"epoch": 3})
    fresh, _ = _tiny_state()
    loaded, extra = ckpt_lib.load(p, fresh)
    assert int(loaded.step) == 7
    assert extra == {"epoch": 3}
    np.testing.assert_array_equal(
        np.asarray(loaded.params["a"]["w"]), np.asarray(state.params["a"]["w"])
    )


def test_convert_torch_state_dict_rules():
    """One representative key per mapping rule."""
    rng = np.random.RandomState(0)
    r = lambda *sh: rng.randn(*sh).astype(np.float32)
    sd = {
        # stripped
        "clip_model.token_embedding.weight": r(10, 4),
        "sequence_pos_encoder.pe": r(100, 1, 8),
        # timestep embedder
        "embed_timestep.time_embed.0.weight": r(8, 8),
        "embed_timestep.time_embed.0.bias": r(8),
        # plain sequential MLP
        "embed_text.2.weight": r(16, 32),
        # attention
        "attn_layer.q_proj_weight": r(8, 8),
        "attn_layer.in_proj_bias": r(24),
        "attn_layer.out_proj.weight": r(8, 8),
        "pcd_attention.k_proj_weight": r(12, 3),
        # in/out process
        "input_process.pose_embedding.0.weight": r(4, 3),
        "output_process.pose_final.2.bias": r(3),
        # human backbone
        "human_backbone.de_spiral.0.conv.layer.weight": r(64, 3),
        "human_backbone.de_spiral.2.conv.layer.weight": r(64, 64),
        "human_backbone.de_spiral.3.layer.weight": r(3, 64),
        "human_backbone.de_spiral.0.norm.weight": r(64),
        # pcd backbone conv/bn
        "pcd_backbone.sa1.mlp_convs.0.weight": r(32, 6, 1, 1),
        "pcd_backbone.sa1.mlp_bns.0.weight": r(32),
        "pcd_backbone.sa1.mlp_bns.0.running_mean": r(32),
        "pcd_backbone.sa1.mlp_bns.0.num_batches_tracked": np.asarray(5),
        "pcd_backbone.fp4.mlp_convs.1.weight": r(256, 256, 1),
        "pcd_backbone.conv1.weight": r(128, 128, 1),
        "pcd_backbone.bn1.running_var": r(128),
        "pcd_backbone.conv2.weight": r(3, 128, 1),
        "pcd_backbone.conv2.bias": r(3),
    }
    params, batch_stats = ckpt_lib.convert_torch_state_dict(sd)

    # torch-layout linears are copied verbatim
    np.testing.assert_array_equal(
        np.asarray(params["embed_timestep"]["time_embed_0"]["weight"]),
        sd["embed_timestep.time_embed.0.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["embed_text"]["2"]["weight"]), sd["embed_text.2.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["attn_layer"]["out_proj"]["weight"]),
        sd["attn_layer.out_proj.weight"],
    )
    # conv (out, in, 1, 1) -> flax Dense kernel (in, out)
    k = np.asarray(params["pcd_backbone"]["sa1"]["mlp_0"]["conv"]["kernel"])
    assert k.shape == (6, 32)
    np.testing.assert_array_equal(
        k, sd["pcd_backbone.sa1.mlp_convs.0.weight"].reshape(32, 6).T
    )
    # bn split: weight->params scale, running stats -> batch_stats
    assert "scale" in params["pcd_backbone"]["sa1"]["mlp_0"]["bn"]
    assert "mean" in batch_stats["pcd_backbone"]["sa1"]["mlp_0"]["bn"]
    assert "var" in batch_stats["pcd_backbone"]["head"]["bn"]
    # groupnorm weight -> scale
    assert "scale" in params["human_backbone"]["de_spiral_0"]["norm"]
    # GraphLin/Spiral blocks keep the torch conv.layer nesting
    assert params["human_backbone"]["de_spiral_0"]["conv"]["layer"]["weight"].shape == (64, 3)
    assert params["human_backbone"]["de_spiral_2"]["conv"]["layer"]["weight"].shape == (64, 64)
    # final spiral conv uses bare "layer"
    assert params["human_backbone"]["de_spiral_3"]["layer"]["weight"].shape == (3, 64)
    # clip keys are gone
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert not any("clip" in jax.tree_util.keystr(p) for p, _ in flat)


def test_convert_unknown_key_raises():
    with pytest.raises(KeyError):
        ckpt_lib.convert_torch_state_dict({"mystery.weight": np.zeros(3)})


def test_skip_nonfinite_optimizer():
    """apply_if_finite skips NaN gradient steps (the bf16-era replacement
    for the reference's fp16 overflow backoff)."""
    from lsdm_tpu.train.state import make_optimizer

    tx = make_optimizer(skip_nonfinite=True)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
    updates, state = tx.update(bad, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.ones(3))  # skipped
    good = {"w": jnp.ones(3)}
    updates, state = tx.update(good, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.ones(3))  # applied


def test_orbax_save_load_roundtrip(tmp_path):
    """Orbax-backed checkpointing (the multi-host/sharded-array path,
    train/checkpoint.py:38-56) round-trips the TrainState."""
    state, _ = _tiny_state()
    state = state.replace(step=jnp.asarray(11, jnp.int32))
    path = ckpt_lib.save_orbax(str(tmp_path), state, step=11)
    assert path.endswith("step_00000011")
    fresh, _ = _tiny_state()
    loaded = ckpt_lib.load_orbax(str(tmp_path), 11, fresh)
    assert int(loaded.step) == 11
    np.testing.assert_array_equal(
        np.asarray(loaded.params["a"]["w"]), np.asarray(state.params["a"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.opt_state[0].mu["b"]),
        np.asarray(state.opt_state[0].mu["b"]),
    )
