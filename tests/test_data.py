"""Data pipeline tests: synthetic generator, dataset contract, loader,
contact dataset, mesh assets, native npy reader."""

import os

import numpy as np
import pytest

from lsdm_tpu.data.dataset import DataLoader, ProxDatasetTxt
from lsdm_tpu.data.contact_dataset import ProxContactDataset
from lsdm_tpu.data.mesh_assets import load_mesh_assets
from lsdm_tpu.data import npy_native
from lsdm_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate(root, "proxd", n_scenes=2, n_seqs=6, pnt_size=64, seed=0)
    return root


def test_dataset_contract(synth):
    ds = ProxDatasetTxt(
        os.path.join(synth, "proxd_train"),
        objs_data_dir=os.path.join(synth, "objs"),
        pnt_size=64,
    )
    assert len(ds) == 6
    mask, verts, cats, target, tcat, prompt, seq = ds[0]
    assert mask.shape == (9,)
    assert verts.shape == (9, 64, 3)
    assert cats.shape == (9, 13)
    assert target.shape == (64, 3)
    assert tcat.shape == (13,) and tcat.sum() == 1
    # human slot: verts set, mask stays 0 (reference quirk), cat = human
    assert mask[0] == 0
    assert cats[0, 0] == 1
    assert np.abs(verts[0]).sum() > 0
    # given objects have mask 1 and their slots are one-hot
    assert mask[1] == 1
    assert cats[1].sum() == 1
    assert isinstance(prompt, str) and len(prompt) > 0


def test_dataloader_batching(synth):
    ds = ProxDatasetTxt(
        os.path.join(synth, "proxd_train"),
        objs_data_dir=os.path.join(synth, "objs"), pnt_size=64,
    )
    loader = DataLoader(ds, 4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.given_objs.shape == (4, 9, 64, 3)
    assert b.mask.shape == (4, 9)
    assert len(b.text) == 4
    # padded final batch repeats the last item to keep static shapes
    b2 = batches[1]
    assert b2.given_objs.shape == (4, 9, 64, 3)
    assert len(set(b2.seq_names)) == 2
    # drop_last drops the short batch
    loader2 = DataLoader(ds, 4, drop_last=True)
    assert len(list(loader2)) == 1


def test_dataloader_prefetch_equals_sync(synth):
    ds = ProxDatasetTxt(
        os.path.join(synth, "proxd_train"),
        objs_data_dir=os.path.join(synth, "objs"), pnt_size=64,
    )
    a = [b.seq_names for b in DataLoader(ds, 2, prefetch=2)]
    b = [b.seq_names for b in DataLoader(ds, 2, prefetch=0)]
    assert a == b


def test_contact_dataset(tmp_path, rng):
    for sub in ("semantics", "vertices_can", "vertices"):
        os.makedirs(tmp_path / sub)
    for s in range(2):
        T, V = 30, 16
        np.save(tmp_path / "vertices_can" / f"s{s}_verts_can.npy",
                rng.randn(T, V, 3).astype(np.float32))
        np.save(tmp_path / "vertices" / f"s{s}_verts.npy",
                rng.randn(T, V, 3).astype(np.float32))
        np.save(tmp_path / "semantics" / f"s{s}_cfs.npy",
                rng.randint(0, 8, (T, V)))
    ds = ProxContactDataset(str(tmp_path), max_frame=8, jump_step=2)
    vc, cs, m = ds[0]
    assert vc.shape == (8, 16, 3)
    assert cs.shape == (8, 16, 8)
    assert m.shape == (8,)
    assert set(np.unique(cs)).issubset({0.0, 1.0})
    # one-hot per masked frame
    valid = m > 0
    assert np.allclose(cs[valid].sum(-1), 1.0)


def test_mesh_assets_synthetic_fallback():
    assets = load_mesh_assets("/nonexistent", nv_override=(16, 4, 2))
    assert assets.synthetic
    assert assets.nv == (16, 4, 2)
    assert assets.spiral_indices[0].shape == (16, 9)
    assert assets.down_mats[0].shape == (4, 16)
    assert assets.down_mats[1].shape == (2, 4)


def test_npy_native_batch(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(5):
        a = rng.rand(8, 3).astype(np.float32)
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out = npy_native.load_batch(paths, 24)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out[i].reshape(8, 3), a)


def _legacy_layout(tmp_path, rng, T=120, V=16, walk=True):
    for sub in ("semantics", "vertices_can", "vertices"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for s in range(2):
        verts = rng.randn(T, V, 3).astype(np.float32) * 0.05
        if walk:  # drifting xy centroid so dist_eps segmentation triggers
            verts[:, :, 0] += np.linspace(0, 4.0, T)[:, None]
        np.save(tmp_path / "vertices" / f"s{s}_verts.npy", verts)
        np.save(tmp_path / "vertices_can" / f"s{s}_verts_can.npy",
                rng.randn(T, V, 3).astype(np.float32))
        np.save(tmp_path / "semantics" / f"s{s}_cfs.npy",
                rng.randint(0, 8, (T, V)))
    return T, V


def test_prox_seg_dataset(tmp_path, rng):
    from lsdm_tpu.data.contact_dataset import ProxSegDataset

    T, V = _legacy_layout(tmp_path, rng)
    ds = ProxSegDataset(str(tmp_path), train_seg_len=8, jump_step=2)
    assert len(ds) == 2 * T // 8
    vc, cs = ds[0]
    assert vc.shape == (8, V, 3)
    assert cs.shape == (8, V, 8)
    assert np.allclose(cs.sum(-1), 1.0)


def test_prox_seg_dataset_seq(tmp_path, rng):
    from lsdm_tpu.data.contact_dataset import ProxSegDatasetSeq

    T, V = _legacy_layout(tmp_path, rng)
    ds = ProxSegDatasetSeq(str(tmp_path), train_seg_len=8, num_seg=3,
                           stride=8, jump_step=2)
    vc, cs = ds[0]
    assert vc.shape == (3, 8, V, 3)
    assert cs.shape == (3, 8, V, 8)
    # consecutive segments stride by stride*jump_step in the source frames;
    # with stride == train_seg_len they tile a contiguous strided window
    assert np.allclose(cs.reshape(3 * 8, V, 8).sum(-1), 1.0)


def test_prox_seg_dataset_var(tmp_path, rng):
    from lsdm_tpu.data.contact_dataset import ProxSegDatasetVar

    T, V = _legacy_layout(tmp_path, rng)
    ds = ProxSegDatasetVar(str(tmp_path), max_frame=16, num_seg=4,
                           dist_eps=0.5, jump_step=2)
    vc, cs, m = ds[0]
    assert vc.shape == (4, 16, V, 3)
    assert cs.shape == (4, 16, V, 8)
    assert m.shape == (4, 16)
    # at least one non-empty variable-length segment; masks are prefixes
    assert m.sum() > 0
    for row in m:
        n = int(row.sum())
        assert np.all(row[:n] == 1) and np.all(row[n:] == 0)
    # padded frames are zeroed
    assert np.allclose(vc[m == 0], 0)
    # the walking motion makes segments end before max_frame (variable length)
    lengths = m.sum(-1)
    assert np.any((lengths > 0) & (lengths < 16))
