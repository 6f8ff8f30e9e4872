"""Reality-check the mesh_ds loader against the REFERENCE's real assets.

The reference ships the precomputed sparse A/D/U matrices, template
meshes, and ``downsampled_weights.npy`` in-repo
(``/root/reference/mesh_ds/``, loaded by ``posa/posa_utils.py:105-116``);
our loader (``data/mesh_assets.py`` + ``ops/mesh.py:get_graph_params``)
had only ever been exercised on the synthetic fallback (VERDICT r03
Missing #3).  This test loads the real files — READ-ONLY data, not code —
through the production path and pins the documented [655, 164, 41]
contract (reference ``posa/posa_models.py:261``).

The files are copied to a tmpdir first: ``load_mesh_assets`` writes a
spiral cache next to the meshes on first load, and /root/reference must
never be written to.
"""

import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spiral extraction over the 655-vert mesh

REF_MESH_DS = "/root/reference/mesh_ds"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_MESH_DS), reason="reference mesh_ds not present")


@pytest.fixture(scope="module")
def mesh_ds_copy(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh_ds")
    for name in os.listdir(REF_MESH_DS):
        if name.endswith((".npz", ".npy", ".obj")):
            shutil.copy(os.path.join(REF_MESH_DS, name), d / name)
    return str(d)


@needs_ref
def test_real_graph_params_shapes_and_stats(mesh_ds_copy):
    from lsdm_tpu.ops.mesh import get_graph_params

    g1 = get_graph_params(mesh_ds_copy, 3)  # level2 (655) -> level3 (164)
    g2 = get_graph_params(mesh_ds_copy, 4)  # level3 (164) -> level4 (41)
    assert g1.D.shape == (164, 655) and g1.U.shape == (655, 164)
    assert g2.D.shape == (41, 164) and g2.U.shape == (164, 41)
    assert g1.A.shape == (164, 164) and g2.A.shape == (41, 41)
    # the real D matrices are vertex selections: every row sums to exactly
    # 1 with a single nonzero (nnz == rows in the shipped npz)
    for D in (g1.D, g2.D):
        rs = np.asarray(D).sum(axis=1)
        np.testing.assert_allclose(rs, 1.0, atol=1e-6)
        assert int((np.asarray(D) != 0).sum()) == D.shape[0]
    # row_normalized_adjacency output must be a stochastic matrix
    for A in (g1.A, g2.A):
        np.testing.assert_allclose(np.asarray(A).sum(axis=1), 1.0,
                                   atol=1e-5)
    # the real U matrices are barycentric (not one-hot): row sums hover
    # around 1 (measured [0.96, 1.12] for U_3) — just pin finiteness and
    # scale so a densify/transpose bug cannot slip through
    for U, lo, hi in ((g1.U, 0.5, 1.5), (g2.U, -1.0, 2.5)):
        rs = np.asarray(U).sum(axis=1)
        assert np.isfinite(rs).all() and rs.min() > lo and rs.max() < hi


@needs_ref
def test_real_mesh_assets_contract(mesh_ds_copy):
    from lsdm_tpu.data.mesh_assets import BODY_NV, load_mesh_assets

    assets = load_mesh_assets(mesh_ds_copy, seq_length=9)
    assert not assets.synthetic
    assert assets.nv == BODY_NV == (655, 164, 41)
    for sp, nv in zip(assets.spiral_indices, assets.nv):
        assert sp.shape == (nv, 9)
        # spiral indices address vertices of the SAME level's mesh
        assert sp.min() >= 0 and sp.max() < nv
        # first element of each spiral is the center vertex itself
        np.testing.assert_array_equal(sp[:, 0], np.arange(nv))
    assert assets.down_mats[0].shape == (164, 655)
    assert assets.down_mats[1].shape == (41, 164)
    assert assets.up_mats[0].shape == (655, 164)
    assert assets.up_mats[1].shape == (164, 41)
    # spiral cache was written to the COPY, proving the tmp indirection
    assert os.path.exists(os.path.join(mesh_ds_copy, "spirals_2_9.npy"))


@needs_ref
def test_real_downsampled_weights(mesh_ds_copy):
    w = np.load(os.path.join(mesh_ds_copy, "downsampled_weights.npy"),
                allow_pickle=True)
    # per-vertex contact weights at mesh level 2: 655 verts x 55 parts
    assert w.shape == (655, 55) and np.isfinite(np.asarray(w, np.float32)).all()


@needs_ref
def test_real_ds_us_roundtrip(mesh_ds_copy):
    """ds_us with the real matrices: downsample then upsample a smooth
    field reconstructs it approximately (barycentric U inverts the
    selection D up to mesh resolution)."""
    import jax.numpy as jnp

    from lsdm_tpu.ops.mesh import ds_us, get_graph_params
    from lsdm_tpu.ops.spiral import load_obj

    g1 = get_graph_params(mesh_ds_copy, 3)
    verts, _ = load_obj(os.path.join(mesh_ds_copy, "mesh_2.obj"))
    x = jnp.asarray(verts, jnp.float32)  # (655, 3) smooth: the coords
    down = ds_us(g1.D, x)  # (164, 3)
    back = ds_us(g1.U, down)  # (655, 3)
    err = float(jnp.abs(back - x).max())
    scale = float(jnp.abs(x).max())
    assert err < 0.2 * scale, (err, scale)
