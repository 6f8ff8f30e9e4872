"""Numerical parity tests of flax modules vs torch (CPU) equivalents.

Torch is used only as a test oracle: small inline replicas of the
reference's layer configurations, never imports of reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lsdm_tpu.ops.attention import TorchMultiheadAttention, TorchLinear
from lsdm_tpu.models.common import InputProcess, OutputProcess, TimestepEmbedder
from lsdm_tpu.models.posa import SpiralConv, GraphLinBlock, POSADecoderBackbone
from lsdm_tpu.ops.spiral import identity_spirals


def t2n(t):
    return t.detach().numpy()


@pytest.fixture(autouse=True)
def _high_precision():
    """Parity vs torch f32 requires full-f32 matmul passes; production keeps
    the fast default (bf16 passes) — a precision choice, not a logic one."""
    with jax.default_matmul_precision("highest"):
        yield


@pytest.mark.parametrize(
    "embed_dim,num_heads,kdim,vdim,L,S",
    [
        (128, 8, 32, 192, 1, 9),   # attn_layer shape family (vdim=pcd_points*pcd_dim)
        (12, 12, 3, 3, 16, 16),    # pcd_attention (head_dim=1)
    ],
)
def test_mha_parity_with_torch(embed_dim, num_heads, kdim, vdim, L, S):
    torch.manual_seed(0)
    B = 3
    tm = torch.nn.MultiheadAttention(
        embed_dim, num_heads, kdim=kdim, vdim=vdim, batch_first=True
    )
    tm.eval()
    q = torch.randn(B, L, embed_dim)
    k = torch.randn(B, S, kdim)
    v = torch.randn(B, S, vdim)
    # float attn mask, tiled like the reference (head-major repeat)
    mask = (torch.rand(B, 1, S) > 0.5).float()
    attn_mask = mask.repeat(num_heads, 1, 1).expand(B * num_heads, L, S)
    with torch.no_grad():
        t_out, t_w = tm(q, k, v, attn_mask=attn_mask)

    jm = TorchMultiheadAttention(
        embed_dim=embed_dim, num_heads=num_heads, kdim=kdim, vdim=vdim
    )
    params = {
        "q_proj_weight": t2n(tm.q_proj_weight),
        "k_proj_weight": t2n(tm.k_proj_weight),
        "v_proj_weight": t2n(tm.v_proj_weight),
        "in_proj_bias": t2n(tm.in_proj_bias),
        "out_proj": {
            "weight": t2n(tm.out_proj.weight),
            "bias": t2n(tm.out_proj.bias),
        },
    }
    j_out, j_w = jm.apply(
        {"params": params},
        jnp.asarray(t2n(q)),
        jnp.asarray(t2n(k)),
        jnp.asarray(t2n(v)),
        attn_mask=jnp.asarray(t2n(attn_mask)),
    )
    np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_w), t2n(t_w), atol=2e-5)


def test_torch_linear_parity():
    torch.manual_seed(1)
    tl = torch.nn.Linear(7, 5)
    x = torch.randn(4, 7)
    jl = TorchLinear(5)
    out = jl.apply(
        {"params": {"weight": t2n(tl.weight), "bias": t2n(tl.bias)}},
        jnp.asarray(t2n(x)),
    )
    np.testing.assert_allclose(np.asarray(out), t2n(tl(x)), atol=1e-5)


def test_input_process_parity():
    """Inline torch replica of reference model/diffusion_utils.py:45-88."""
    torch.manual_seed(2)
    D = 16
    pose = torch.nn.Sequential(
        torch.nn.Linear(3, D // 2), torch.nn.Sigmoid(),
        torch.nn.Linear(D // 2, D), torch.nn.Sigmoid(),
    )
    comb = torch.nn.Sequential(
        torch.nn.Linear(D * 2, int(D * 1.5)), torch.nn.Sigmoid(),
        torch.nn.Linear(int(D * 1.5), D), torch.nn.Sigmoid(),
    )
    x = torch.randn(2, 10, 3)
    emb = torch.randn(2, 10, D)
    with torch.no_grad():
        expected = comb(torch.cat([pose(x), emb], dim=-1))

    jm = InputProcess(3, D)
    params = {
        "pose_embedding": {
            "0": {"weight": t2n(pose[0].weight), "bias": t2n(pose[0].bias)},
            "2": {"weight": t2n(pose[2].weight), "bias": t2n(pose[2].bias)},
        },
        "combination_extraction": {
            "0": {"weight": t2n(comb[0].weight), "bias": t2n(comb[0].bias)},
            "2": {"weight": t2n(comb[2].weight), "bias": t2n(comb[2].bias)},
        },
    }
    out = jm.apply({"params": params}, jnp.asarray(t2n(x)), jnp.asarray(t2n(emb)))
    np.testing.assert_allclose(np.asarray(out), t2n(expected), atol=1e-5)


def test_output_process_parity():
    torch.manual_seed(3)
    D, P = 16, 10
    final = torch.nn.Sequential(
        torch.nn.Linear(D, D // 2), torch.nn.GELU(),
        torch.nn.Linear(D // 2, 3), torch.nn.GELU(),
    )
    x = torch.randn(2, P, D)
    with torch.no_grad():
        expected = final(x).reshape(2, P, -1)
    jm = OutputProcess(3, D, P)
    params = {
        "pose_final": {
            "0": {"weight": t2n(final[0].weight), "bias": t2n(final[0].bias)},
            "2": {"weight": t2n(final[2].weight), "bias": t2n(final[2].bias)},
        }
    }
    out = jm.apply({"params": params}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(out), t2n(expected), atol=1e-5)


def test_timestep_embedder_parity():
    """Replica of reference TimestepEmbedder + PositionalEncoding
    (model/diffusion_utils.py:7-42)."""
    torch.manual_seed(4)
    D = 32
    lin1 = torch.nn.Linear(D, D)
    lin2 = torch.nn.Linear(D, D)
    pe = torch.zeros(100, D)
    position = torch.arange(0, 100, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, D, 2).float() * (-np.log(10000.0) / D)
    )
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    pe = pe.unsqueeze(0).transpose(0, 1)  # (100, 1, D)
    ts = torch.tensor([0, 7, 42])
    with torch.no_grad():
        # reference: time_embed(pe[timesteps]).permute(1,0,2) then permute back
        expected = lin2(torch.nn.functional.silu(lin1(pe[ts])))  # (B, 1, D)
    jm = TimestepEmbedder(D, max_len=100)
    params = {
        "time_embed_0": {"weight": t2n(lin1.weight), "bias": t2n(lin1.bias)},
        "time_embed_2": {"weight": t2n(lin2.weight), "bias": t2n(lin2.bias)},
    }
    out = jm.apply({"params": params}, jnp.asarray(t2n(ts)))
    np.testing.assert_allclose(np.asarray(out), t2n(expected), atol=1e-5)


def test_spiral_conv_parity():
    """SpiralConv = index_select gather + linear (posa_models.py:85-105)."""
    torch.manual_seed(5)
    nv, L, C, out = 20, 4, 6, 8
    rng = np.random.RandomState(0)
    indices = rng.randint(0, nv, size=(nv, L)).astype(np.int32)
    lin = torch.nn.Linear(C * L, out)
    x = torch.randn(2, nv, C)
    with torch.no_grad():
        g = torch.index_select(x, 1, torch.tensor(indices.reshape(-1), dtype=torch.long))
        g = g.view(2, nv, -1)
        expected = lin(g)
    jm = SpiralConv(out, indices)
    params = {"layer": {"weight": t2n(lin.weight), "bias": t2n(lin.bias)}}
    got = jm.apply({"params": params}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), t2n(expected), atol=1e-5)


def test_graphlin_block_groupnorm_parity():
    """GraphLin + GroupNorm(8) + ReLU vs torch permute dance
    (posa_models.py:132-160)."""
    torch.manual_seed(6)
    C_in, C_out = 5, 16
    lin = torch.nn.Linear(C_in, C_out)
    gn = torch.nn.GroupNorm(8, C_out)
    x = torch.randn(3, 11, C_in)
    with torch.no_grad():
        h = lin(x)
        h = gn(h.permute(0, 2, 1)).permute(0, 2, 1)
        expected = torch.relu(h)
    jm = GraphLinBlock(C_out, num_groups=8)
    params = {
        "conv": {"layer": {"weight": t2n(lin.weight), "bias": t2n(lin.bias)}},
        "norm": {"scale": t2n(gn.weight), "bias": t2n(gn.bias)},
    }
    got = jm.apply({"params": params}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), t2n(expected), atol=1e-5)


def test_posa_decoder_backbone_shapes():
    m = POSADecoderBackbone(vert_dims=40, pcd_points=64, z_dim=16, channels=8)
    x = jnp.zeros((2, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 64, 3)
