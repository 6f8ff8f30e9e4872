"""The SDM's 'exotic' reshapes (reference model/sdm.py:191-203) scramble
object/feature axes via torch's contiguous row-major reshape of permuted
tensors. These tests pin our jnp transpose+reshape replication to torch
bit-for-bit, including the broadcast-multiply semantics on the scrambled
layouts."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_permute_reshape_scramble_matches_torch(rng):
    B, O, N, C = 2, 9, 16, 3
    x = rng.randn(B, N * C, O).astype(np.float32)  # post-(0,2,1)-permute layout
    w = rng.rand(B, 1, O).astype(np.float32)  # attention weights

    tx = torch.from_numpy(x.copy())
    tout = (tx * torch.from_numpy(w)).reshape(B, O, N, C)

    jout = (jnp.asarray(x) * jnp.asarray(w)).reshape(B, O, N, C)
    np.testing.assert_array_equal(np.asarray(jout), tout.numpy())


def test_full_sdm_reshape_chain_matches_torch(rng):
    """The whole :191-203 chain: permute, weight, scramble-reshape, view to
    clouds, concat, scramble to (N, 3, B, O), mask, reshape back, sum."""
    B, O, N, C, T = 2, 9, 16, 3, 12
    pcd = rng.randn(B, O, N * C).astype(np.float32)
    w = rng.rand(B, 1, O).astype(np.float32)
    trans_feat = rng.randn(B, O, N, T).astype(np.float32)
    mask = (rng.rand(B, O) > 0.5).astype(np.float32)
    lin_w = rng.randn(C, C + T).astype(np.float32)
    lin_b = rng.randn(C).astype(np.float32)

    # ---- torch (the reference's op sequence)
    tp = torch.from_numpy(pcd.copy())
    tp = tp.permute(0, 2, 1)
    tp = tp * torch.from_numpy(w)
    tp = tp.reshape(B, O, N, -1)
    tcat = torch.cat([tp, torch.from_numpy(trans_feat)], dim=-1)
    tlin = torch.nn.functional.gelu(
        tcat @ torch.from_numpy(lin_w).T + torch.from_numpy(lin_b)
    )
    tscr = tlin.reshape(N, -1, B, O)
    tscr = tscr * torch.from_numpy(mask)
    tout = tscr.reshape(B, O, N, -1).sum(dim=1)

    # ---- jax (our replication in models/sdm.py)
    import jax

    jp = jnp.transpose(jnp.asarray(pcd), (0, 2, 1))
    jp = jp * jnp.asarray(w)
    jp = jp.reshape(B, O, N, -1)
    jcat = jnp.concatenate([jp, jnp.asarray(trans_feat)], axis=-1)
    jlin = jax.nn.gelu(
        jcat @ jnp.asarray(lin_w).T + jnp.asarray(lin_b), approximate=False
    )
    jscr = jlin.reshape(N, -1, B, O)
    jscr = jscr * jnp.asarray(mask)
    jout = jscr.reshape(B, O, N, -1).sum(axis=1)

    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-5)


def test_view_to_clouds_matches_torch(rng):
    B, O, N, C = 2, 9, 16, 3
    x = rng.randn(B, O, N, C).astype(np.float32)
    tv = torch.from_numpy(x.copy()).view(-1, N, C)
    jv = jnp.asarray(x).reshape(B * O, N, C)
    np.testing.assert_array_equal(np.asarray(jv), tv.numpy())
