"""Composed full-model parity: torch reference replica -> converter -> ours.

The strongest available proxy for the checkpoint-parity north star
(BASELINE.md): build the ENTIRE reference SceneDiffusionModel forward graph
(``model/sdm.py:131-218``) as an inline torch replica at tiny config — the
real module names, the real Sequential indices, the real permute/reshape
dance — convert its ``state_dict()`` with
:func:`lsdm_tpu.train.checkpoint.convert_torch_state_dict`, and assert the
composed outputs (out_cat, x0, guiding points) match our flax model.

If any converter rule, module name, or graph quirk drifts, this test fails.

Determinism notes:
  * The reference FPS starts at ``torch.randint`` (``pointnet2_utils.py:72``);
    the replica pins the start to index 0, matching our
    ``farthest_point_sample(key=None)``; our model runs ``fps_mode="exact"``
    so sa1 uses the same sequential selection.
  * torch modules run in ``.eval()`` (BN running stats, no dropout) against
    our ``train=False`` apply with the converted ``batch_stats``.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from lsdm_tpu.config import SDMConfig
from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.train.checkpoint import convert_torch_state_dict


@pytest.fixture(autouse=True)
def _high_precision():
    with jax.default_matmul_precision("highest"):
        yield


# ---------------------------------------------------------------------------
# torch replica of the reference pcd backbone (pointnet2_utils.py, pointnet2.py)


def _square_distance(src, dst):
    B, N, _ = src.shape
    _, M, _ = dst.shape
    dist = -2 * torch.matmul(src, dst.permute(0, 2, 1))
    dist += torch.sum(src ** 2, -1).view(B, N, 1)
    dist += torch.sum(dst ** 2, -1).view(B, 1, M)
    return dist


def _index_points(points, idx):
    B = points.shape[0]
    view_shape = list(idx.shape)
    view_shape[1:] = [1] * (len(view_shape) - 1)
    repeat_shape = list(idx.shape)
    repeat_shape[0] = 1
    batch_indices = (
        torch.arange(B, dtype=torch.long).view(view_shape).repeat(repeat_shape)
    )
    return points[batch_indices, idx, :]


def _fps(xyz, npoint):
    """Reference FPS (pointnet2_utils.py:60-81) with start pinned to 0."""
    B, N, _ = xyz.shape
    centroids = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.ones(B, N) * 1e10
    farthest = torch.zeros(B, dtype=torch.long)  # randint -> 0 (determinism)
    batch_indices = torch.arange(B, dtype=torch.long)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
        dist = torch.sum((xyz - centroid) ** 2, -1)
        mask = dist < distance
        distance[mask] = dist[mask]
        farthest = torch.max(distance, -1)[1]
    return centroids


def _query_ball(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    nsample = min(nsample, N)  # tiny-config clamp, same as our JAX SA stage
    group_idx = torch.arange(N, dtype=torch.long).view(1, 1, N).repeat([B, S, 1])
    sqrdists = _square_distance(new_xyz, xyz)
    group_idx[sqrdists > radius ** 2] = N
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    group_first = group_idx[:, :, 0].view(B, S, 1).repeat([1, 1, nsample])
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


class RefSA(nn.Module):
    """reference PointNetSetAbstraction (pointnet2_utils.py:158-199)."""

    def __init__(self, npoint, radius, nsample, in_channel, mlp):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channel
        for out in mlp:
            self.mlp_convs.append(nn.Conv2d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm2d(out))
            last = out

    def forward(self, xyz, points):
        xyz = xyz.permute(0, 2, 1)
        if points is not None:
            points = points.permute(0, 2, 1)
        fps_idx = _fps(xyz, self.npoint)
        new_xyz = _index_points(xyz, fps_idx)
        idx = _query_ball(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = _index_points(xyz, idx)
        grouped_xyz = grouped_xyz - new_xyz.view(
            xyz.shape[0], self.npoint, 1, 3
        )
        if points is not None:
            grouped_points = _index_points(points, idx)
            new_points = torch.cat([grouped_xyz, grouped_points], dim=-1)
        else:
            new_points = grouped_xyz
        new_points = new_points.permute(0, 3, 2, 1)  # [B, C+D, K, S]
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            new_points = F.relu(bn(conv(new_points)))
        new_points = torch.max(new_points, 2)[0]
        return new_xyz.permute(0, 2, 1), new_points


class RefFP(nn.Module):
    """reference PointNetFeaturePropagation (pointnet2_utils.py:262-312)."""

    def __init__(self, in_channel, mlp):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channel
        for out in mlp:
            self.mlp_convs.append(nn.Conv1d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm1d(out))
            last = out

    def forward(self, xyz1, xyz2, points1, points2):
        xyz1 = xyz1.permute(0, 2, 1)
        xyz2 = xyz2.permute(0, 2, 1)
        points2 = points2.permute(0, 2, 1)
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = points2.repeat(1, N, 1)
        else:
            k = min(3, S)  # tiny-config clamp, same as our three_nn_interpolate
            dists = _square_distance(xyz1, xyz2)
            dists, idx = dists.sort(dim=-1)
            dists, idx = dists[:, :, :k], idx[:, :, :k]
            dist_recip = 1.0 / (dists + 1e-8)
            norm = torch.sum(dist_recip, dim=2, keepdim=True)
            weight = dist_recip / norm
            interpolated = torch.sum(
                _index_points(points2, idx) * weight.view(B, N, k, 1), dim=2
            )
        if points1 is not None:
            new_points = torch.cat(
                [points1.permute(0, 2, 1), interpolated], dim=-1
            )
        else:
            new_points = interpolated
        new_points = new_points.permute(0, 2, 1)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            new_points = F.relu(bn(conv(new_points)))
        return new_points


class RefBackbone(nn.Module):
    """reference get_backbone (pointnet2.py:43-80) at configurable sizes."""

    def __init__(self, num_classes, npoints, nsample=32):
        super().__init__()
        p1, p2, p3, p4 = npoints
        self.sa1 = RefSA(p1, 0.1, nsample, 3 + 3, [32, 32, 64])
        self.sa2 = RefSA(p2, 0.2, nsample, 64 + 3, [64, 64, 128])
        self.sa3 = RefSA(p3, 0.4, nsample, 128 + 3, [128, 128, 256])
        self.sa4 = RefSA(p4, 0.8, nsample, 256 + 3, [256, 256, 512])
        self.fp4 = RefFP(768, [256, 256])
        self.fp3 = RefFP(384, [256, 256])
        self.fp2 = RefFP(320, [256, 128])
        self.fp1 = RefFP(128, [128, 128, 128])
        self.conv1 = nn.Conv1d(128, 128, 1)
        self.bn1 = nn.BatchNorm1d(128)
        self.drop1 = nn.Dropout(0.5)
        self.conv2 = nn.Conv1d(128, num_classes, 1)

    def forward(self, xyz):
        xyz = xyz.permute(0, 2, 1)
        l0_points = xyz
        l0_xyz = xyz[:, :3, :]
        l1_xyz, l1_points = self.sa1(l0_xyz, l0_points)
        l2_xyz, l2_points = self.sa2(l1_xyz, l1_points)
        l3_xyz, l3_points = self.sa3(l2_xyz, l2_points)
        l4_xyz, l4_points = self.sa4(l3_xyz, l3_points)
        l3_points = self.fp4(l3_xyz, l4_xyz, l3_points, l4_points)
        l2_points = self.fp3(l2_xyz, l3_xyz, l2_points, l3_points)
        l1_points = self.fp2(l1_xyz, l2_xyz, l1_points, l2_points)
        l0_points = self.fp1(l0_xyz, l1_xyz, None, l1_points)
        x = self.drop1(F.relu(self.bn1(self.conv1(l0_points))))
        x = self.conv2(x)
        return x.permute(0, 2, 1)


# ---------------------------------------------------------------------------
# torch replica of the POSA Decoder human backbone (posa_models.py:292-326)


class RefSpiralConv(nn.Module):
    def __init__(self, in_channels, out_channels, indices):
        super().__init__()
        self.indices = indices  # plain attr, NOT a buffer (like the reference)
        self.layer = nn.Linear(in_channels * indices.shape[1], out_channels)

    def forward(self, x):
        n_nodes = self.indices.shape[0]
        bs = x.shape[0]
        x = torch.index_select(x, 1, self.indices.reshape(-1))
        return self.layer(x.view(bs, n_nodes, -1))


class RefGraphLinBlock(nn.Module):
    def __init__(self, in_channels, out_channels, num_groups=8):
        super().__init__()
        inner = nn.Module()
        inner.layer = nn.Linear(in_channels, out_channels)
        self.conv = inner
        if out_channels % num_groups != 0:
            num_groups = out_channels
        self.norm = nn.GroupNorm(num_groups, out_channels)

    def forward(self, x):
        x = self.conv.layer(x)
        x = self.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
        return torch.relu(x)


class RefSpiralBlock(nn.Module):
    def __init__(self, in_channels, out_channels, indices, num_groups=8):
        super().__init__()
        self.conv = RefSpiralConv(in_channels, out_channels, indices)
        if out_channels % num_groups != 0:
            num_groups = out_channels
        self.norm = nn.GroupNorm(num_groups, out_channels)

    def forward(self, x):
        x = self.conv(x)
        x = self.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
        return torch.relu(x)


class RefPOSADecoder(nn.Module):
    """reference Decoder with seq_length=1 identity spirals."""

    def __init__(self, vert_dims, pcd_points, z_dim=128, channels=64):
        super().__init__()
        idx = torch.arange(vert_dims, dtype=torch.long).view(-1, 1)
        self.pcd_points = pcd_points
        self.de_spiral = nn.Sequential(
            RefGraphLinBlock(3, z_dim // 2),
            RefGraphLinBlock(z_dim // 2, channels),
            RefSpiralBlock(channels, channels, idx),
            RefSpiralConv(channels, 3, idx),
        )
        self.upsampling = nn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, vertices):
        x = self.de_spiral(vertices)
        x = self.upsampling(x.permute(0, 2, 1)).permute(0, 2, 1)
        return x[:, : self.pcd_points]


# ---------------------------------------------------------------------------
# the full reference SDM forward (model/sdm.py:131-218), text pre-encoded


class RefSDM(nn.Module):
    def __init__(self, cfg: SDMConfig):
        super().__init__()
        D = cfg.latent_dim
        self.cfg = cfg
        self.n_head = cfg.n_head

        pe = torch.zeros(5000, D)
        position = torch.arange(0, 5000, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, D, 2).float() * (-np.log(10000.0) / D)
        )
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        spe = nn.Module()
        spe.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))
        self.sequence_pos_encoder = spe

        te = nn.Module()
        te.time_embed = nn.Sequential(
            nn.Linear(D, D), nn.SiLU(), nn.Linear(D, D)
        )
        self.embed_timestep = te

        self.embed_text = nn.Sequential(
            nn.Linear(cfg.clip_dim, cfg.clip_dim // 2), nn.GELU(),
            nn.Linear(cfg.clip_dim // 2, D * 2), nn.GELU(),
            nn.Linear(D * 2, D), nn.GELU(),
        )
        self.embed_cat = nn.Sequential(
            nn.Linear(cfg.max_cats, cfg.cat_emb), nn.GELU()
        )
        self.predict_cat = nn.Sequential(
            nn.Linear(D, D // 2), nn.GELU(),
            nn.Linear(D // 2, D // 4), nn.GELU(),
            nn.Linear(D // 4, cfg.max_cats), nn.GELU(),
            nn.Softmax(dim=2),
        )
        self.attn_layer = nn.MultiheadAttention(
            embed_dim=D, num_heads=cfg.n_head, kdim=cfg.cat_emb,
            vdim=cfg.pcd_points * cfg.pcd_dim, batch_first=True,
        )
        self.translation_layer = nn.Sequential(
            nn.Linear(D + cfg.cat_emb, D), nn.GELU(),
            nn.Linear(D, cfg.translation_params), nn.GELU(),
        )
        self.point_wise_trans_layer = nn.Sequential(
            nn.Linear(cfg.translation_params + cfg.xyz_dim, cfg.xyz_dim),
            nn.GELU(),
        )
        self.pcd_attention = nn.MultiheadAttention(
            embed_dim=cfg.translation_params,
            num_heads=cfg.translation_params,
            kdim=cfg.xyz_dim, vdim=cfg.xyz_dim, batch_first=True,
        )
        N = cfg.pcd_points
        self.pcd_backbone = RefBackbone(
            cfg.pcd_dim,
            (N, max(N // 4, 4), max(N // 16, 2), max(N // 64, 1)),
            nsample=min(32, N),
        )
        self.human_backbone = RefPOSADecoder(cfg.vert_dims, cfg.pcd_points)
        self.upsampling_layer = nn.Sequential(
            nn.Linear(1, 128), nn.GELU(),
            nn.Linear(128, 512), nn.GELU(),
            nn.Linear(512, cfg.pcd_points), nn.GELU(),
        )
        self.combine_extraction = nn.Sequential(
            nn.Linear(D * 2, D), nn.GELU()
        )

        ip = nn.Module()
        ip.pose_embedding = nn.Sequential(
            nn.Linear(cfg.xyz_dim, D // 2), nn.Sigmoid(),
            nn.Linear(D // 2, D), nn.Sigmoid(),
        )
        ip.combination_extraction = nn.Sequential(
            nn.Linear(D * 2, int(D * 1.5)), nn.Sigmoid(),
            nn.Linear(int(D * 1.5), D), nn.Sigmoid(),
        )
        self.input_process = ip

        op = nn.Module()
        op.pose_final = nn.Sequential(
            nn.Linear(D, D // 2), nn.GELU(),
            nn.Linear(D // 2, cfg.xyz_dim), nn.GELU(),
        )
        self.output_process = op

    def _input_process(self, x, emb):
        x = self.input_process.pose_embedding(x.to(torch.float32))
        x = torch.cat((x, emb), dim=-1)
        return self.input_process.combination_extraction(x)

    def _output_process(self, output):
        nframes = output.shape[0]
        output = self.output_process.pose_final(output)
        return output.reshape(nframes, self.cfg.pcd_points, -1)

    def forward(self, x, mask, timesteps, given_objs, given_cats, enc_text_raw):
        # model/sdm.py:141-142
        emb_ts = self.embed_timestep.time_embed(
            self.sequence_pos_encoder.pe[timesteps]
        ).permute(1, 0, 2).permute(1, 0, 2)
        # :145-154 (CLIP replaced by the precomputed enc_text_raw)
        enc_text = self.embed_text(enc_text_raw).unsqueeze(1)
        # :157-158
        out_cat = self.predict_cat(enc_text.clone().detach())
        # :161
        emb_cat = self.embed_cat(given_cats)
        # :164-167
        emb = torch.cat((emb_ts, enc_text), dim=-1)
        emb = emb.permute(0, 2, 1)
        emb = self.upsampling_layer(emb)
        emb = emb.permute(0, 2, 1)
        # :169-177
        bs, num_obj, num_points, pcd_dim = given_objs.shape
        hm_in = given_objs[:, 0].clone().detach()
        given_objs = given_objs.reshape(bs * num_obj, num_points, pcd_dim)
        hm_out = self.human_backbone(hm_in)
        pcd_out = self.pcd_backbone(given_objs)
        pcd_out = pcd_out.reshape(bs, num_obj, -1)
        # :180-182
        attn_mask = mask.unsqueeze(1).clone().detach()
        attn_mask = attn_mask.repeat(self.n_head, 1, 1)
        _, attn_w = self.attn_layer(
            enc_text, emb_cat, pcd_out, attn_mask=attn_mask
        )
        # :185-188
        enc_text_rep = enc_text.repeat(1, num_obj, 1)
        emb_cat2 = torch.cat((emb_cat, enc_text_rep), dim=-1)
        translation = (
            self.translation_layer(emb_cat2)
            .unsqueeze(-2)
            .repeat(1, 1, self.cfg.pcd_points, 1)
        )
        translation = translation.view(
            -1, self.cfg.pcd_points, self.cfg.translation_params
        )
        # :191-204 (the exotic reshapes)
        pcd_out = pcd_out.permute(0, 2, 1)
        pcd_out = pcd_out * attn_w
        pcd_out = pcd_out.reshape(bs, num_obj, num_points, -1)
        pcd_trans = pcd_out.reshape(-1, self.cfg.pcd_points, self.cfg.xyz_dim)
        pcd_trans, _ = self.pcd_attention(translation, pcd_trans, pcd_trans)
        pcd_trans = pcd_trans.view(bs, num_obj, num_points, -1)
        pcd_out = torch.cat((pcd_out, pcd_trans), dim=-1)
        pcd_out = self.point_wise_trans_layer(pcd_out)
        pcd_out = pcd_out.reshape(num_points, -1, bs, num_obj)
        pcd_out = pcd_out * mask
        pcd_out = pcd_out.reshape(bs, num_obj, num_points, -1)
        pcd_out = pcd_out.sum(dim=1)
        pcd_out = (pcd_out + hm_out) / 2
        x = x + pcd_out
        # :207-217
        emb = self.combine_extraction(emb)
        x = self._output_process(self._input_process(x, emb))
        guiding = self._output_process(self._input_process(pcd_out, emb))
        return out_cat, x, guiding


# ---------------------------------------------------------------------------


TINY = SDMConfig(
    clip_dim=32, latent_dim=16, cat_emb=8, n_head=4, vert_dims=24,
    pcd_points=32, fps_mode="exact",
)


def _randomize(model: nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_full_sdm_composed_parity():
    cfg = TINY
    B, O, N = 2, cfg.max_objs, cfg.pcd_points

    ref = RefSDM(cfg)
    _randomize(ref)
    ref.eval()

    g = torch.Generator().manual_seed(1)
    x = torch.randn(B, N, 3, generator=g)
    mask = torch.zeros(B, O)
    mask[:, 1:5] = 1.0
    t = torch.tensor([3, 7])
    objs = torch.randn(B, O, N, 3, generator=g)
    cats = F.one_hot(
        torch.randint(0, cfg.max_cats, (B, O), generator=g), cfg.max_cats
    ).float()
    text = torch.randn(B, cfg.clip_dim, generator=g)

    with torch.no_grad():
        t_cat, t_x0, t_guid = ref(x, mask, t, objs.clone(), cats, text)

    # --- convert & run ours
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_torch_state_dict(sd, max_cats=cfg.max_cats)

    model = SceneDiffusionModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(t.numpy()), jnp.asarray(objs.numpy()),
        jnp.asarray(cats.numpy()), jnp.asarray(text.numpy()),
    )
    # converter completeness: the converted trees must have exactly the
    # init trees' structure (any missing/extra key is a converter bug)
    ref_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    got_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    assert got_paths == ref_paths, (
        f"missing: {ref_paths - got_paths}\nextra: {got_paths - ref_paths}"
    )
    bs_ref = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    }
    bs_got = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(batch_stats)
    }
    assert bs_got == bs_ref

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(t.numpy()), jnp.asarray(objs.numpy()),
        jnp.asarray(cats.numpy()), jnp.asarray(text.numpy()),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(out.cat), t_cat.numpy(), atol=2e-5,
        err_msg="category head diverged",
    )
    np.testing.assert_allclose(
        np.asarray(out.x0), t_x0.numpy(), atol=2e-4,
        err_msg="denoised x0 diverged",
    )
    np.testing.assert_allclose(
        np.asarray(out.guiding), t_guid.numpy(), atol=2e-4,
        err_msg="guiding points diverged",
    )
