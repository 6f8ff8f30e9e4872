"""PointNet++ backbone (reference ``model/pcd_backbone/pointnet2.py:43-80``
and ``pointnet2_utils.py``), JAX/flax.

Four SetAbstraction stages (FPS -> ball query -> grouped MLP -> maxpool)
1024 -> 256 -> 64 -> 16 points, then four FeaturePropagation stages
(3-NN inverse-distance interpolation) back to 1024, conv head ->
(B, 1024, out_dim).

TPU notes: all gathers are ``take_along_axis`` with static shapes; the
grouped MLPs are Dense layers over the trailing channel axis (layout
(B, S, K, C) instead of torch's (B, C, K, S) — same math, better XLA
fusion); FPS is the on-device ``lax.scan`` from
:func:`lsdm_tpu.ops.pointcloud.farthest_point_sample`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lsdm_tpu.ops.pointcloud import (
    farthest_point_sample,
    index_points,
    index_points_mm,
    query_ball_point,
    three_nn_interpolate,
)


class ConvBNBlock(nn.Module):
    """1x1 conv (= Dense over channels) + BatchNorm + ReLU, the unit of both
    SA and FP MLPs (reference ``pointnet2_utils.py:167-169,268-270``).

    ``bn_dtype`` controls the BatchNorm compute dtype (params/stats stay
    fp32).  Default fp32 matches the reference numerics; bf16 keeps the
    grouped (B, S, K, C) buffers half-width through the BN boundaries —
    in train mode BN's batch reductions force materialization, so this
    halves the dominant HBM traffic of the backbone (PERF.md)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # setup-style (not @nn.compact) so the SA hoist path can apply
        # the Dense and the BN+relu separately; attribute names keep the
        # param-tree scopes "conv"/"bn" the checkpoint converter expects
        self.conv = nn.Dense(self.features, dtype=self.dtype)
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                               dtype=self.bn_dtype)

    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return self.bn_relu(self.conv(x), train)

    def dense(self, x: jax.Array) -> jax.Array:
        return self.conv(x)

    def bn_relu(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.relu(self.bn(x, use_running_average=not train))


class PointNetSetAbstraction(nn.Module):
    """(reference ``pointnet2_utils.py:158-199``)"""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    # "auto": skip the sequential FPS scan when npoint == N (selecting ALL
    # points — only their order changes, which downstream ops don't depend
    # on); "exact": always run the reference's sequential selection.
    fps_mode: str = "auto"
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32
    # neighbour-selection formulation: "topk" is fastest on one chip,
    # "spmd" partitions cleanly on a sharded batch axis (ops/pointcloud.py)
    select_impl: str = "topk"
    # ball-query override: "auto" follows select_impl; "sg" fuses ball
    # query + gather + center-relative xyz into one train-legal Pallas
    # kernel (ops/sg_fused_pallas.py, custom VJP); "fused" is the
    # eval-only whole-stage kernel; or force one of query_ball_point's
    # formulations ("topk"/"topk_p"/"pallas"/"scatter"/"binsearch")
    ball_impl: str = "auto"
    # "matmul": MXU one-hot backward for the grouping gather (faster than
    # XLA's serialized scatter-add at train shapes, bf16-grade grads);
    # "matmul_fwd": one-hot matmul for the forward too (5x over the TPU
    # random gather at sa1 shapes, PERF.md round-3; bf16-exact);
    # "scatter": exact VJP and the trace-identical default — eval/sample
    # programs keep their compiled-cache hash (ops/pointcloud.py:
    # index_points_mm)
    gather_bwd: str = "scatter"
    # Hoist the stage's LAYER-1 Dense from the grouped (S*K) domain to
    # the N point domain (round 5).  Associativity:
    #   gather(base)[s,k] @ W1 == gather(base @ W1)[s,k]
    # and the center-relative xyz part contributes only the rank-1 term
    # center[s] @ W1[:3], so
    #   pre1[s,k] = (base @ W1 + b1)[idx[s,k]] - center[s] @ W1[:3]
    # — S*K/N times fewer layer-1 FLOPs (32x at sa1, 8x at sa2-4) and
    # the grouped (B, S, K, C_in) INPUT buffer never materializes (only
    # the layer-1 preactivation does).  BN still sees the grouped
    # population, so train statistics are unchanged; the regrouping only
    # reassociates float accumulation (bf16-grade deltas).  Exact VJP of
    # the new composition via autodiff; partitions like the composed
    # path (matmuls + the same gathers).  Off by default: the composed
    # path is the reference-shaped graph.
    hoist_layer1: bool = False
    # batch-parallel FPS kernel (round 5, ops/fps_batched_pallas.py):
    # npoint loop overheads instead of B*npoint; bit-identical indices
    fps_batched: bool = False
    # NamedSharding of the flattened cloud axis (round 5): when set and
    # the batch divides the shard count, the Pallas selection kernels
    # run per-shard under jax.shard_map (parallel/mesh.py:
    # cloud_shard_map) instead of falling back to the slower composed
    # SPMD formulations; indivisible batches fall back to "topk_p".
    shard: Optional[object] = None

    def _kernel_shard(self, batch: int) -> Optional[object]:
        """The sharding to shard_map kernels over, or None."""
        if self.shard is None:
            return None
        from lsdm_tpu.parallel.mesh import shard_count

        return self.shard if batch % shard_count(self.shard) == 0 else None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,  # (B, N, 3)
        points: Optional[jax.Array],  # (B, N, D) or None
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, C = xyz.shape
        kshard = self._kernel_shard(B)
        if self.fps_mode == "auto" and self.npoint == N:
            new_xyz = xyz  # FPS of N points out of N = identity set
        else:
            fps_impl = ("pallas" if self.ball_impl in ("pallas", "fused",
                                                       "sg") else "scan")
            if fps_impl == "pallas" and self.fps_batched:
                # batch-parallel kernel: npoint loop overheads instead of
                # B*npoint (ops/fps_batched_pallas.py, bit-identical)
                fps_impl = "pallas_b"
            if fps_impl.startswith("pallas") and kshard is not None:
                from lsdm_tpu.ops.fps_batched_pallas import \
                    farthest_point_sample_batched
                from lsdm_tpu.ops.fps_pallas import \
                    farthest_point_sample_pallas
                from lsdm_tpu.parallel.mesh import cloud_shard_map

                kernel = (farthest_point_sample_batched
                          if fps_impl == "pallas_b"
                          else farthest_point_sample_pallas)
                # the random start draw happens OUTSIDE shard_map (a key
                # cannot be split per-shard transparently); the kernel
                # then consumes the per-shard slice of farthest0
                farthest0 = (jnp.zeros((B,), jnp.int32) if fps_key is None
                             else jax.random.randint(fps_key, (B,), 0, N,
                                                     dtype=jnp.int32))
                npoint = self.npoint
                interp = jax.default_backend() == "cpu"
                fps_idx = cloud_shard_map(
                    lambda a, f: kernel(
                        jax.lax.stop_gradient(a.astype(jnp.float32)),
                        npoint, f, interpret=interp),
                    kshard, 2, xyz, farthest0)
            else:
                fps_idx = farthest_point_sample(
                    xyz, self.npoint, key=fps_key, impl=fps_impl)
            new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
        # nsample can exceed the available points in down-scaled test configs
        ball = self.ball_impl
        if ball == "fused":
            if (not train and points is not None
                    and new_xyz.shape[1] % 8 == 0):
                # whole stage as ONE Pallas kernel: selection masks double
                # as one-hot gather matrices, layer 1 hoisted to the N
                # points, eval BatchNorm folded — the grouped (B, S, K, C)
                # buffer never exists (ops/sa_fused_pallas.py)
                from lsdm_tpu.ops.sa_fused_pallas import (
                    fold_conv_bn, sa_stage_fused)
                base = jnp.concatenate([xyz, points], axis=-1)
                blocks = [
                    ConvBNBlock(f, dtype=self.dtype, bn_dtype=self.bn_dtype,
                                name=f"mlp_{i}")
                    for i, f in enumerate(self.mlp)
                ]
                # tiny dummy chain creates/binds the exact same param tree
                # as the composed path (checkpoint-name parity)
                d = jnp.zeros((1, 1, 1, base.shape[-1]), self.dtype)
                for blk in blocks:
                    d = blk(d, train=False)
                folded = tuple(fold_conv_bn(blk.variables) for blk in blocks)
                new_points = sa_stage_fused(
                    self.radius, min(self.nsample, N), xyz, new_xyz, base,
                    folded, compute_dtype=self.dtype,
                    interpret=jax.default_backend() == "cpu")
                return new_xyz, new_points
            ball = "pallas"  # train / tiny configs: composed fallback
        new_points = None
        if ball == "sg":
            if points is not None and new_xyz.shape[1] % 8 == 0:
                # ball query + gather + center-relative xyz as ONE kernel
                # with a custom VJP: the selection masks double as one-hot
                # gather matrices, so the forward gather einsum and the
                # idx round-trip disappear; MLP/BN/maxpool (and their
                # gradients) stay with XLA (ops/sg_fused_pallas.py)
                from lsdm_tpu.ops.sg_fused_pallas import \
                    select_gather_grouped
                base = jnp.concatenate([xyz, points], axis=-1)
                if self.dtype != jnp.float32:
                    base = base.astype(self.dtype)
                new_points = select_gather_grouped(
                    self.radius, min(self.nsample, N), jnp.dtype(self.dtype),
                    jax.default_backend() == "cpu", xyz, new_xyz, base)
            else:
                ball = "pallas"  # xyz-only / tiny configs: composed path
        mlp_start = 0
        if new_points is None:
            if ball == "auto":
                # sharded context: partitioned top_k — the TopK custom call
                # per batch shard, zero collectives (ops/pointcloud.py:
                # topk_rows).  The scatter/binsearch reformulations also
                # partition but are 18x/26x slower on-chip (PERF.md round 3).
                ball = "topk_p" if self.select_impl == "spmd" else "topk"
            if ball == "pallas" and self.shard is not None:
                if kshard is not None:
                    # per-shard fused selection kernel under shard_map —
                    # keeps the train-default kernel on a sharded mesh
                    from lsdm_tpu.parallel.mesh import cloud_shard_map

                    r, K = self.radius, min(self.nsample, N)
                    idx = cloud_shard_map(
                        lambda a, b: query_ball_point(r, K, a, b,
                                                      impl="pallas"),
                        kshard, 3, xyz, new_xyz)
                else:
                    # indivisible shard count: partition-clean composed
                    ball = "topk_p"
                    idx = query_ball_point(
                        self.radius, min(self.nsample, N), xyz, new_xyz,
                        impl=ball)
            else:
                idx = query_ball_point(
                    self.radius, min(self.nsample, N), xyz, new_xyz,
                    impl=ball)
            if self.hoist_layer1:
                # layer-1 Dense at the N domain, then gather its output
                # and subtract the per-center rank-1 term (see the field
                # docstring for the algebra)
                base = (xyz if points is None
                        else jnp.concatenate([xyz, points], axis=-1))
                if self.dtype != jnp.float32:
                    base = base.astype(self.dtype)
                blk0 = ConvBNBlock(self.mlp[0], dtype=self.dtype,
                                   bn_dtype=self.bn_dtype, name="mlp_0")
                z = blk0.dense(base)  # (B, N, C1), bias included
                gather = (index_points if self.gather_bwd == "scatter"
                          else lambda p, i: index_points_mm(
                              p, i, N,
                              "matmul" if self.gather_bwd == "matmul_fwd"
                              else "gather"))
                grouped_z = gather(z, idx)  # (B, S, K, C1)
                w_xyz = blk0.variables["params"]["conv"]["kernel"][:C]
                zc = new_xyz.astype(z.dtype) @ w_xyz.astype(z.dtype)
                new_points = blk0.bn_relu(
                    grouped_z - zc[:, :, None, :].astype(grouped_z.dtype),
                    train)
                mlp_start = 1
            elif points is not None:
                # ONE gather of the pre-concatenated columns instead of two:
                # gather-then-concat == concat-then-gather, and the random-
                # access gather (+ its scatter-add backward) is the
                # backbone's dominant cost (PERF.md round-3 attribution).
                # In low-precision modes the early cast also halves the
                # gathered bytes.
                base = jnp.concatenate([xyz, points], axis=-1)
                if self.dtype != jnp.float32:
                    base = base.astype(self.dtype)
                gather = (index_points if self.gather_bwd == "scatter"
                          else lambda p, i: index_points_mm(
                              p, i, N,
                              "matmul" if self.gather_bwd == "matmul_fwd"
                              else "gather"))
                grouped = gather(base, idx)  # (B, S, K, 3 + D)
                center = new_xyz[:, :, None, :].astype(grouped.dtype)
                new_points = jnp.concatenate(
                    [grouped[..., :C] - center, grouped[..., C:]], axis=-1)
            else:
                grouped_xyz = index_points(xyz, idx)  # (B, S, K, 3)
                new_points = grouped_xyz - new_xyz[:, :, None, :]
        for i, feats in enumerate(self.mlp):
            if i < mlp_start:
                continue  # layer already applied by the hoist path
            new_points = ConvBNBlock(feats, dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"mlp_{i}")(
                new_points, train
            )
        new_points = jnp.max(new_points, axis=2)  # maxpool over the K samples
        return new_xyz, new_points


class PointNetFeaturePropagation(nn.Module):
    """(reference ``pointnet2_utils.py:262-312``)"""

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32
    select_impl: str = "topk"
    # "auto": follow select_impl; "pallas": fused 3-NN kernel
    nn_impl: str = "auto"
    # interpolation-gather formulation, as in PointNetSetAbstraction:
    # "scatter" (exact, trace-identical eval default) or
    # "matmul"/"matmul_fwd" (one-hot MXU backward/both — train)
    gather_bwd: str = "scatter"
    # sharded cloud axis: shard_map the 3-NN kernel (see
    # PointNetSetAbstraction.shard)
    shard: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,  # (B, N, 3) target positions
        xyz2: jax.Array,  # (B, S, 3) source positions
        points1: Optional[jax.Array],  # (B, N, D1) or None
        points2: jax.Array,  # (B, S, D2)
        train: bool = False,
        extra_folded: tuple = (),  # eval-only trailing (W', b') layers
        extra_acts: tuple = (),    # their activations ("relu"/"none")
    ) -> jax.Array:
        S = xyz2.shape[1]
        if (self.nn_impl == "fused" and not train and S > 1
                and xyz1.shape[1] % 8 == 0):
            # whole stage as ONE Pallas kernel: the 3-NN masks scaled by
            # the normalized inverse-distance weights form one (BS, S)
            # combination matrix, so interpolate == one MXU contraction;
            # eval BatchNorm folded (ops/fp_fused_pallas.py)
            from lsdm_tpu.ops.fp_fused_pallas import fp_stage_fused
            from lsdm_tpu.ops.sa_fused_pallas import fold_conv_bn
            blocks = [
                ConvBNBlock(f, dtype=self.dtype, bn_dtype=self.bn_dtype,
                            name=f"mlp_{i}")
                for i, f in enumerate(self.mlp)
            ]
            # tiny dummy chain creates/binds the exact same param tree as
            # the composed path (checkpoint-name parity)
            d1 = 0 if points1 is None else points1.shape[-1]
            d = jnp.zeros((1, 1, 1, d1 + points2.shape[-1]), self.dtype)
            for blk in blocks:
                d = blk(d, train=False)
            folded = tuple(fold_conv_bn(blk.variables) for blk in blocks)
            return fp_stage_fused(
                xyz1, xyz2, points1, points2,
                folded + tuple(extra_folded),
                acts=("relu",) * len(folded) + tuple(extra_acts),
                compute_dtype=self.dtype,
                interpret=jax.default_backend() == "cpu")
        if S == 1:
            interpolated = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[2])
            )
        else:
            impl = (("pallas" if self.nn_impl == "fused" else self.nn_impl)
                    if self.nn_impl != "auto"
                    else ("topk_p" if self.select_impl == "spmd" else "topk"))
            kshard = None
            if impl == "pallas" and self.shard is not None:
                from lsdm_tpu.parallel.mesh import shard_count

                if xyz1.shape[0] % shard_count(self.shard) == 0:
                    kshard = self.shard
                else:
                    impl = "topk_p"  # indivisible: partition-clean composed
            # under train the inverse-distance WEIGHTS carry gradients in
            # the reference graph; the VJP-less kernel still works because
            # gradients flow only through the selected distance VALUES at
            # fixed indices — diff_weights recomputes those k distances
            # differentiably outside the kernel (round 4,
            # ops/pointcloud.py:three_nn_interpolate)
            if kshard is not None:
                # per-shard 3-NN kernel (+ its differentiable weight
                # recompute and feature gather) under shard_map — zero
                # collectives, shard_map autodiff carries the gradients
                from lsdm_tpu.parallel.mesh import cloud_shard_map

                dw, gb = train, self.gather_bwd
                interpolated = cloud_shard_map(
                    lambda a, b, p: three_nn_interpolate(
                        a, b, p, impl="pallas", diff_weights=dw,
                        gather_bwd=gb),
                    kshard, 3, xyz1, xyz2, points2)
            else:
                interpolated = three_nn_interpolate(xyz1, xyz2, points2,
                                                    impl=impl,
                                                    diff_weights=train,
                                                    gather_bwd=self.gather_bwd)
        if points1 is not None:
            new_points = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            new_points = interpolated
        for i, feats in enumerate(self.mlp):
            new_points = ConvBNBlock(feats, dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"mlp_{i}")(
                new_points, train
            )
        # extras are BN-folded EVAL weights; callers pass them only in eval
        # (the backbone's fused tail) — applied here when the kernel gate
        # above didn't take, so fused/composed stay interchangeable
        for (w, b), act in zip(extra_folded, extra_acts):
            new_points = (new_points.astype(self.dtype) @ w.astype(self.dtype)
                          + b).astype(jnp.float32)
            if act == "relu":
                new_points = jax.nn.relu(new_points)
            new_points = new_points.astype(self.dtype)
        return new_points


class PointNet2Backbone(nn.Module):
    """``get_backbone`` (reference ``pointnet2.py:43-80``): returns per-point
    features (B, N, out_dim); the SDM uses out_dim = pcd_dim = 3."""

    out_dim: int = 3
    dropout_rate: float = 0.5
    # Stage sizes; defaults are the reference's hardcoded 1024/256/64/16
    # (pointnet2.py:46-49).  Configurable so tests can run tiny clouds.
    sa_npoints: tuple = (1024, 256, 64, 16)
    sa_nsample: int = 32
    fps_mode: str = "auto"
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32
    select_impl: str = "topk"
    ball_impl: str = "auto"
    gather_bwd: str = "scatter"
    # hoist each SA stage's layer-1 Dense to the N domain (train
    # optimization, round 5 — see PointNetSetAbstraction.hoist_layer1)
    hoist_layer1: bool = False
    # batch-parallel FPS kernel (round 5 — see
    # PointNetSetAbstraction.fps_batched)
    fps_batched: bool = False
    # sharded cloud axis: shard_map the Pallas kernels per shard
    # (round 5 — see PointNetSetAbstraction.shard)
    shard: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,  # (B, N, 3)
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        keys = (
            jax.random.split(fps_key, 4) if fps_key is not None else [None] * 4
        )
        l0_xyz, l0_points = xyz, xyz
        p1, p2, p3, p4 = self.sa_npoints
        ns = self.sa_nsample
        sa1 = PointNetSetAbstraction(p1, 0.1, ns, (32, 32, 64), fps_mode=self.fps_mode, dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, ball_impl=self.ball_impl, gather_bwd=self.gather_bwd, hoist_layer1=self.hoist_layer1, fps_batched=self.fps_batched, shard=self.shard, name="sa1")
        sa2 = PointNetSetAbstraction(p2, 0.2, ns, (64, 64, 128), fps_mode=self.fps_mode, dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, ball_impl=self.ball_impl, gather_bwd=self.gather_bwd, hoist_layer1=self.hoist_layer1, fps_batched=self.fps_batched, shard=self.shard, name="sa2")
        sa3 = PointNetSetAbstraction(p3, 0.4, ns, (128, 128, 256), fps_mode=self.fps_mode, dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, ball_impl=self.ball_impl, gather_bwd=self.gather_bwd, hoist_layer1=self.hoist_layer1, fps_batched=self.fps_batched, shard=self.shard, name="sa3")
        sa4 = PointNetSetAbstraction(p4, 0.8, ns, (256, 256, 512), fps_mode=self.fps_mode, dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, ball_impl=self.ball_impl, gather_bwd=self.gather_bwd, hoist_layer1=self.hoist_layer1, fps_batched=self.fps_batched, shard=self.shard, name="sa4")
        l1_xyz, l1_points = sa1(l0_xyz, l0_points, train, keys[0])
        l2_xyz, l2_points = sa2(l1_xyz, l1_points, train, keys[1])
        l3_xyz, l3_points = sa3(l2_xyz, l2_points, train, keys[2])
        l4_xyz, l4_points = sa4(l3_xyz, l3_points, train, keys[3])

        # ball_impl="pallas" extends to the FP 3-NN; "fused" runs the whole
        # FP stage as one kernel too (same kernel family)
        nn_impl = (self.ball_impl if self.ball_impl in ("pallas", "fused")
                   else "pallas" if self.ball_impl == "sg"
                   else "auto")
        fp4 = PointNetFeaturePropagation((256, 256), dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, nn_impl=nn_impl, gather_bwd=self.gather_bwd, shard=self.shard, name="fp4")
        fp3 = PointNetFeaturePropagation((256, 256), dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, nn_impl=nn_impl, gather_bwd=self.gather_bwd, shard=self.shard, name="fp3")
        fp2 = PointNetFeaturePropagation((256, 128), dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, nn_impl=nn_impl, gather_bwd=self.gather_bwd, shard=self.shard, name="fp2")
        fp1 = PointNetFeaturePropagation((128, 128, 128), dtype=self.dtype, bn_dtype=self.bn_dtype, select_impl=self.select_impl, nn_impl=nn_impl, gather_bwd=self.gather_bwd, shard=self.shard, name="fp1")
        l3_points = fp4(l3_xyz, l4_xyz, l3_points, l4_points, train)
        l2_points = fp3(l2_xyz, l3_xyz, l2_points, l3_points, train)
        l1_points = fp2(l1_xyz, l2_xyz, l1_points, l2_points, train)

        head = ConvBNBlock(128, dtype=self.dtype, bn_dtype=self.bn_dtype,
                           name="head")
        conv2 = nn.Dense(self.out_dim, dtype=self.dtype, name="conv2")
        if self.ball_impl == "fused" and not train:
            # eval: dropout is identity, so head + conv2 ride fp1's fused
            # kernel as two trailing layers — the whole post-SA tail is
            # ONE kernel (dummy calls bind the identical param tree)
            from lsdm_tpu.ops.sa_fused_pallas import fold_conv_bn
            d = head(jnp.zeros((1, 1, 1, 128), self.dtype), train=False)
            conv2(d)
            extra = (fold_conv_bn(head.variables),
                     (conv2.variables["params"]["kernel"].astype(jnp.float32),
                      conv2.variables["params"]["bias"].astype(jnp.float32)))
            return fp1(l0_xyz, l1_xyz, None, l1_points, train,
                       extra_folded=extra, extra_acts=("relu", "none"))
        l0_points = fp1(l0_xyz, l1_xyz, None, l1_points, train)

        x = head(l0_points, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = conv2(x)
        return x
