"""Tests for ATISS/MIME, the DMLL machinery, ContactFormer, BridgeModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdm_tpu.models.atiss import (
    AutoregressiveTransformer,
    MIME,
    fixed_positional_encoding,
    sample_from_dmll,
    dmll,
    mmd,
)
from lsdm_tpu.models.contactformer import ContactFormer
from lsdm_tpu.models.bridge import BridgeModel, contact_class_to_category
from lsdm_tpu.ops.mesh import synthetic_graph_params
from lsdm_tpu.ops.spiral import grid_mesh, extract_spirals

N_CLASSES = 15  # num_classes + 7 like run/train_atiss.py:289


def make_boxes(B=2, L=4, C=N_CLASSES, contact=False):
    rng = np.random.RandomState(0)
    boxes = {
        "class_labels": jax.nn.one_hot(
            jnp.asarray(rng.randint(0, C, (B, L))), C
        ),
        "translations": jnp.asarray(rng.randn(B, L, 3).astype(np.float32)),
        "sizes": jnp.asarray(rng.rand(B, L, 3).astype(np.float32)),
        "angles": jnp.asarray(rng.randn(B, L, 1).astype(np.float32)),
        "room_layout": jnp.ones((B, 1, 64, 64)),
        "class_labels_tr": jnp.ones((B, 1, C)),
        "translations_tr": jnp.ones((B, 1, 3)),
        "sizes_tr": jnp.ones((B, 1, 3)),
        "angles_tr": jnp.ones((B, 1, 1)),
    }
    if contact:
        boxes["contact_labels"] = jnp.ones((B, L, 1))
    return boxes


def test_fixed_positional_encoding_shape():
    x = jnp.ones((2, 3, 1))
    out = fixed_positional_encoding(x, 64)
    assert out.shape == (2, 3, 64)
    # sin/cos structure: sin^2 + cos^2 = 1
    s, c = out[..., :32], out[..., 32:]
    np.testing.assert_allclose(np.asarray(s**2 + c**2), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def atiss():
    model = AutoregressiveTransformer(
        n_classes=N_CLASSES, n_layers=2, dim_ff=128, hidden_dims=128
    )
    boxes = make_boxes()
    variables = model.init(jax.random.PRNGKey(0), boxes)
    return model, variables


def test_atiss_forward_members(atiss):
    model, variables = atiss
    out = model.apply(variables, make_boxes())
    assert len(out.members) == 8
    # scalar heads: each property is (B, 1, 1); class logits (B, 1, C)
    assert out.sizes_x.shape == (2, 1, 1)
    assert out.translations_z.shape == (2, 1, 1)
    assert out.class_labels.shape == (2, 1, N_CLASSES)
    for m in out.members:
        assert np.isfinite(np.asarray(m)).all()


def test_atiss_distribution_classes(atiss):
    model, variables = atiss
    probs = model.apply(variables, make_boxes(), method=model.distribution_classes)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_atiss_decode_step(atiss):
    model, variables = atiss
    out = model.apply(
        variables, make_boxes(), jax.random.PRNGKey(1), method=model.decode_step
    )
    assert out["class_labels"].shape == (2, 1, N_CLASSES)
    assert out["translations"].shape == (2, 1, 3)
    assert out["sizes"].shape == (2, 1, 3)
    assert out["angles"].shape == (2, 1, 1)
    # one-hot class sample
    np.testing.assert_allclose(np.asarray(out["class_labels"].sum(-1)), 1.0)


def test_mime_contact_channel():
    model = MIME(n_classes=N_CLASSES, n_layers=2, dim_ff=128, hidden_dims=128)
    boxes = make_boxes(contact=True)
    variables = model.init(jax.random.PRNGKey(0), boxes)
    out = model.apply(variables, boxes)
    assert out.class_labels.shape == (2, 1, N_CLASSES)


def test_dmll_loss_prefers_correct_mean():
    rng = np.random.RandomState(0)
    target = jnp.zeros((4, 8, 1))
    nr = 5
    good = jnp.concatenate(
        [jnp.zeros((4, 8, nr)), jnp.zeros((4, 8, nr)), jnp.full((4, 8, nr), -3.0)],
        axis=-1,
    )
    bad = good.at[..., nr : 2 * nr].set(0.9)  # means far from target
    assert float(dmll(good, target)) < float(dmll(bad, target))


def test_sample_from_dmll_within_bounds():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(16, 15).astype(np.float32))
    s = sample_from_dmll(pred, jax.random.PRNGKey(0))
    assert s.shape == (16, 1)
    assert (np.abs(np.asarray(s)) <= 1.0).all()


def test_mmd_zero_for_same_dist(rng):
    x = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    assert float(mmd(x, x)) < 1e-5
    y = jnp.asarray(rng.randn(64, 4).astype(np.float32) + 5.0)
    assert float(mmd(x, y)) > 0.1  # disjoint supports: cross-kernel ~ 0


# ---------------- ContactFormer ----------------


def _cf_setup(decoder_mode):
    nv = (16, 8, 4)
    verts, faces = grid_mesh(4)  # 16 vertices
    sp0 = extract_spirals(verts, faces, 9)
    sp1 = np.tile(np.arange(nv[1])[:, None], (1, 9)).astype(np.int32)
    sp2 = np.tile(np.arange(nv[2])[:, None], (1, 9)).astype(np.int32)
    d1 = synthetic_graph_params(nv[1], nv[0]).D
    d2 = synthetic_graph_params(nv[2], nv[1]).D
    model = ContactFormer(
        spiral_indices=(sp0, sp1, sp2),
        down_mats=(d1, d2),
        seg_len=8,
        decoder_mode=decoder_mode,
        n_layer=1,
        n_head=2,
        dim_ff=32,
        d_hid=32,
        vert_dims=nv[0],
    )
    # override POSA nv chain for the tiny mesh
    T, V = 6, 16
    cf = jax.nn.one_hot(jnp.zeros((T, V), jnp.int32), 8)
    vertices = jnp.asarray(np.random.RandomState(0).randn(T, V, 3), jnp.float32)
    mask = jnp.ones((1, 8))
    return model, cf, vertices, mask


@pytest.mark.parametrize("mode", [0, 2, 3, 4])
def test_contactformer_modes(mode):
    model, cf, vertices, mask = _cf_setup(mode)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, cf, vertices, mask, jax.random.PRNGKey(1)
    )
    out, mu, logvar = model.apply(
        variables, cf, vertices, mask, jax.random.PRNGKey(2)
    )
    assert out.shape == (1, 6, 16, 8)
    assert mu.shape == (1, 6, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_contactformer_encdec_mode():
    model, cf, vertices, mask = _cf_setup(1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, cf, vertices, mask, jax.random.PRNGKey(1)
    )
    out, _, _ = model.apply(variables, cf, vertices, mask, jax.random.PRNGKey(2))
    assert out.shape == (1, 6, 16, 8)


# ---------------- Bridge ----------------


def test_contact_class_lookup():
    assert contact_class_to_category(3, "proxd") == 1  # chair
    assert contact_class_to_category(1, "proxd") == -1  # wall not a category
    assert contact_class_to_category(6, "humanise") == 1  # bed


def test_bridge_model_end_to_end(atiss):
    model, variables = atiss

    def atiss_apply(boxes):
        return model.apply(variables, boxes)

    def posa_decode(z, verts):
        # stand-in decoder: deterministic logits from vertex positions
        B, V, _ = verts.shape
        return jnp.tile(verts[..., :1], (1, 1, 8)) * jnp.arange(8)

    bridge = BridgeModel(atiss_apply, posa_decode, "proxd", N_CLASSES)
    rng = np.random.RandomState(0)
    objs = rng.randn(2, 5, 64, 3).astype(np.float32)
    cats = np.eye(N_CLASSES, dtype=np.float32)[rng.randint(0, 13, (2, 5))]
    mask = np.zeros((2, 5), np.float32)
    mask[:, 1:4] = 1
    out = bridge(objs, cats, mask)
    assert out.class_labels.shape == (2, 1, N_CLASSES)
    assert np.isfinite(np.asarray(out.translations_x)).all()


def test_atiss_pe_variant_order_aware():
    """Repaired AutoregressiveTransformerPE (models/atiss.py): 512-wide
    tokens (60-dim property encodings + 32-dim learned slot embedding);
    the slot embedding makes the encoder ORDER-aware where the base class
    is permutation-invariant; gradients flow to the embedding."""
    from lsdm_tpu.models.atiss import AutoregressiveTransformerPE

    model = AutoregressiveTransformerPE(
        n_classes=N_CLASSES, n_layers=2, dim_ff=128, hidden_dims=128
    )
    boxes = make_boxes()
    variables = model.init(jax.random.PRNGKey(0), boxes)
    assert variables["params"]["positional_embedding"].shape == (32, 32)
    out = model.apply(variables, boxes)
    assert out.class_labels.shape == (2, 1, N_CLASSES)
    for m in out.members:
        assert np.isfinite(np.asarray(m)).all()

    def permuted(b):
        seq_keys = ("class_labels", "translations", "sizes", "angles")
        return {k: (v[:, ::-1] if k in seq_keys else v) for k, v in b.items()}

    enc = lambda mdl, vs, b: mdl.apply(vs, b, method=mdl.encode)
    f, f_perm = enc(model, variables, boxes), enc(model, variables, permuted(boxes))
    assert not np.allclose(np.asarray(f), np.asarray(f_perm), atol=1e-5)

    # contrast: the base class (no slot embedding) is permutation-invariant
    base = AutoregressiveTransformer(
        n_classes=N_CLASSES, n_layers=2, dim_ff=128, hidden_dims=128
    )
    bvars = base.init(jax.random.PRNGKey(0), boxes)
    np.testing.assert_allclose(
        np.asarray(enc(base, bvars, boxes)),
        np.asarray(enc(base, bvars, permuted(boxes))), atol=1e-5)

    # gradient flows into the learned slot embedding
    def loss(params):
        o = model.apply({"params": params}, boxes)
        return sum(jnp.sum(m**2) for m in o.members)

    g = jax.grad(loss)(variables["params"])["positional_embedding"]
    assert float(jnp.abs(g[:4]).sum()) > 0  # used slots get gradient
    np.testing.assert_allclose(np.asarray(g[4:]), 0.0)  # unused slots don't


def test_atiss_pe_guards_and_factory():
    from lsdm_tpu.models.atiss import AutoregressiveTransformerPE
    from lsdm_tpu.run._baseline_common import build_model

    model, input_dims = build_model("atiss_pe", N_CLASSES - 7)
    assert isinstance(model, AutoregressiveTransformerPE)
    assert input_dims == N_CLASSES

    with pytest.raises(ValueError, match="max_seq_length"):
        m = AutoregressiveTransformerPE(
            n_classes=N_CLASSES, n_layers=1, dim_ff=64, hidden_dims=64)
        m.init(jax.random.PRNGKey(0), make_boxes(L=33))

    with pytest.raises(ValueError, match="ATISS-only"):
        m = AutoregressiveTransformerPE(
            n_classes=N_CLASSES, n_layers=1, dim_ff=64, hidden_dims=64,
            contact=True)
        m.init(jax.random.PRNGKey(0), make_boxes(contact=True))
