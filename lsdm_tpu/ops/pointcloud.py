"""Core point-cloud ops, XLA-first.

TPU-native equivalents of the reference's PointNet++ utilities
(``model/pcd_backbone/pointnet2_utils.py``) and the pytorch3d chamfer loss
(``diffusion/gaussian_diffusion.py:17,1334``).

Design notes:
  * Clouds are tiny (<=1024 points), so the O(N^2) pairwise-distance matmul
    is one MXU-friendly ``dot_general`` — no KNN trees, no CUDA kernels.
  * FPS is inherently sequential; the reference runs a 1024-iteration Python
    loop on GPU (``pointnet2_utils.py:74-80``).  Here it is a ``lax.scan``
    of masked argmax updates, compiled once and fused by XLA.
  * Ball query replicates the reference's quirk of picking the *lowest-index*
    points inside the radius (it sorts indices, not distances —
    ``pointnet2_utils.py:97-103``), since trained weights depend on it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance (B, N, M).

    Same expansion as reference ``pointnet2_utils.py:19-38``:
    ``|x|^2 + |y|^2 - 2 x.y`` — one batched matmul on the MXU.
    """
    # HIGHEST precision: the |x|^2+|y|^2-2xy expansion cancels catastrophically
    # under the default bf16 matmul passes (diag error ~1e-4); full-f32
    # passes keep it ~1e-8, and these matmuls are tiny (<=1024^2).
    d = -2.0 * jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(src.astype(jnp.float32) ** 2, -1)[:, :, None]
    d = d + jnp.sum(dst.astype(jnp.float32) ** 2, -1)[:, None, :]
    return d


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather (reference ``pointnet2_utils.py:41-57``).

    points: (B, N, C); idx: (B, ...) int -> (B, ..., C).
    """
    return jnp.take_along_axis(
        points.reshape(points.shape[0], 1, points.shape[1], points.shape[2]),
        idx.reshape(idx.shape[0], 1, -1, 1),
        axis=2,
    ).reshape(*idx.shape, points.shape[-1])


# HBM budget for the transient one-hot in index_points_mm's backward
# (module-level so tests can force the chunked path at small shapes).
ONEHOT_TRANSIENT_CAP_BYTES = 8e8


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def index_points_mm(points: jax.Array, idx: jax.Array,
                    n_points: int, fwd: str = "gather") -> jax.Array:
    """:func:`index_points` with a matmul backward (and optional matmul
    forward).

    Backward: the gather's VJP is a segment-sum of (B, S*K) gradient rows
    into N bins — XLA lowers that to a serialized scatter-add that measures
    ~28 ms at the sa1 training shapes (PERF.md round-3 probe), the single
    largest op in the train step.  Here the segment-sum is a one-hot
    contraction on the MXU instead: grad_points[b, n] =
    sum_g [idx[b, g] == n] * grad[b, g], chunked over the gathered-rows
    axis to bound the transient one-hot buffer.  Gradients are bf16-pass
    accurate, which training does not distinguish; eval paths never see
    the difference.

    Forward (``fwd``):

    * ``"gather"`` (default): ``take_along_axis`` — bit-exact.
    * ``"matmul"``: the same one-hot contraction run forwards,
      out[b, g] = sum_n [idx[b, g] == n] * points[b, n].  A TPU random
      gather at (54, 32768)<-1024 rows measures 16.6 ms; the one-hot
      matmul 3.3 ms (PERF.md round-3 layout probe) — selection via MXU
      beats selection via addressing.  For bf16 inputs the result is
      bit-exact (1.0 * v accumulated in f32); for fp32 the HIGHEST-pass
      contraction is exact up to the bf16x3 operand split (~f32-exact).

    ``n_points`` must equal ``points.shape[1]`` (static).
    """
    if fwd == "gather":
        return index_points(points, idx)
    return _gather_mm(points, idx, n_points)


def _gather_mm(points, idx, n_points):
    B = idx.shape[0]
    C = points.shape[-1]
    N = n_points
    flat_idx = idx.reshape(B, -1)  # (B, G)
    G = flat_idx.shape[1]
    bf16 = points.dtype == jnp.bfloat16

    def sel_mm(ci):
        if bf16:
            onehot = (ci[..., None] == jnp.arange(N)).astype(jnp.bfloat16)
            out = jnp.einsum("bgn,bnc->bgc", onehot, points,
                             preferred_element_type=jnp.float32)
        else:
            onehot = (ci[..., None] == jnp.arange(N)).astype(jnp.float32)
            out = jnp.einsum("bgn,bnc->bgc", onehot,
                             points.astype(jnp.float32),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        return out.astype(points.dtype)

    itemsize = 2 if bf16 else 4
    cap = max(1, int(ONEHOT_TRANSIENT_CAP_BYTES // max(B * N * itemsize, 1)))
    if G <= cap:
        out = sel_mm(flat_idx)
    else:
        chunk = next(c for c in range(cap, 0, -1) if G % c == 0)
        out = jax.lax.map(
            sel_mm, flat_idx.reshape(B, G // chunk, chunk).swapaxes(0, 1)
        ).swapaxes(0, 1).reshape(B, G, C)
    return out.reshape(*idx.shape, C)


def _index_points_mm_fwd(points, idx, n_points, fwd):
    return index_points_mm(points, idx, n_points, fwd), idx


def onehot_segment_sum(idx: jax.Array, grad: jax.Array,
                       n_points: int) -> jax.Array:
    """Segment-sum of gradient rows into their source bins as a one-hot
    MXU contraction: out[b, n] = sum_g [idx[b, g] == n] * grad[b, g].

    The shared backward of every matmul-gather formulation
    (:func:`index_points_mm` and the fused select+gather kernel,
    ops/sg_fused_pallas.py).  idx: (B, ...); grad: (B, ..., C) ->
    (B, n_points, C) f32.  Chunked over the gathered-rows axis to bound
    the transient one-hot (see the cap note in the caller below)."""
    B = idx.shape[0]
    C = grad.shape[-1]
    N = n_points
    flat_idx = idx.reshape(B, -1)  # (B, G)
    flat_grad = grad.reshape(B, -1, C)  # (B, G, C)
    G = flat_idx.shape[1]

    def seg_mm(ci, cg):
        # bf16 one-hot (0/1 exact) x bf16 cotangent, f32 accumulate: the
        # only loss is truncating each gradient value to bf16 (~1e-3 rel)
        # — standard mixed-precision training noise, far below SGD noise.
        onehot = (ci[..., None] == jnp.arange(N)).astype(jnp.bfloat16)
        return jnp.einsum(
            "bgn,bgc->bnc", onehot, cg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)

    # Chunk the G (gathered-rows) axis so the transient one-hot stays
    # bounded (B*Gc*N bf16; 3.5 GB unchunked at sa1's 54 x 32768 x 1024).
    # Chunking G — not B — keeps the batch axis whole, so a sharded batch
    # axis (parallel/mesh.py obj_sharding) partitions the scan cleanly
    # instead of forcing a reshard of the scanned operand.
    cap = max(1, int(ONEHOT_TRANSIENT_CAP_BYTES // max(B * N * 2, 1)))
    if G <= cap:
        grad_points = seg_mm(flat_idx, flat_grad)
    else:
        chunk = next(c for c in range(cap, 0, -1) if G % c == 0)

        def body(acc, args):
            ci, cg = args
            return acc + seg_mm(ci, cg), None

        grad_points, _ = jax.lax.scan(
            body,
            jnp.zeros((B, N, C), jnp.float32),
            (flat_idx.reshape(B, G // chunk, chunk).swapaxes(0, 1),
             flat_grad.reshape(B, G // chunk, chunk, C).swapaxes(0, 1)),
        )
    return grad_points


def _index_points_mm_bwd(n_points, fwd, idx, grad):
    grad_points = onehot_segment_sum(idx, grad, n_points)
    return grad_points.astype(grad.dtype), None


index_points_mm.defvjp(_index_points_mm_fwd, _index_points_mm_bwd)


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    x_mask: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Bidirectional chamfer with pytorch3d reductions.

    Matches ``pytorch3d.loss.chamfer_distance`` defaults (point_reduction
    "mean", batch_reduction "mean", both directions summed), which is the
    reference's training loss (``gaussian_diffusion.py:1334``) and eval
    metric (``run/test_sdm.py:186``).

    x: (B, N, 3), y: (B, M, 3).  Optional masks select valid points.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    d = square_distance(x, y)  # (B, N, M)
    if y_mask is not None:
        d = jnp.where(y_mask[:, None, :] > 0, d, jnp.inf)
    if x_mask is not None:
        d_t = jnp.where(x_mask[:, :, None] > 0, d, jnp.inf)
    else:
        d_t = d
    min_xy = jnp.min(d, axis=2)  # (B, N) nearest y for each x
    min_yx = jnp.min(d_t, axis=1)  # (B, M) nearest x for each y
    if x_mask is not None:
        cham_x = jnp.sum(min_xy * x_mask, axis=1) / jnp.maximum(
            jnp.sum(x_mask, axis=1), 1
        )
    else:
        cham_x = jnp.mean(min_xy, axis=1)
    if y_mask is not None:
        cham_y = jnp.sum(min_yx * y_mask, axis=1) / jnp.maximum(
            jnp.sum(y_mask, axis=1), 1
        )
    else:
        cham_y = jnp.mean(min_yx, axis=1)
    return jnp.mean(cham_x + cham_y)


def farthest_point_sample(
    xyz: jax.Array, npoint: int, key: Optional[jax.Array] = None,
    impl: str = "scan",
) -> jax.Array:
    """Farthest-point sampling indices (B, npoint).

    Reference algorithm (``pointnet2_utils.py:60-81``) as a ``lax.scan``:
    start from a random point (or 0 when ``key is None`` for determinism),
    iteratively pick the point farthest from the selected set.

    ``impl="pallas"`` runs the whole selection in one kernel per scene
    with the running min-distance row VMEM-resident (ops/fps_pallas.py;
    bit-identical indices).
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if key is None:
        farthest0 = jnp.zeros((B,), jnp.int32)
    else:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    if impl == "pallas":
        from lsdm_tpu.ops.fps_pallas import farthest_point_sample_pallas
        # integer indices: non-differentiable by construction; stop the
        # gradient so the VJP-less kernel works inside a train step
        return farthest_point_sample_pallas(
            jax.lax.stop_gradient(xyz), npoint, farthest0,
            interpret=jax.default_backend() == "cpu")
    if impl == "pallas_b":
        # batch-parallel variant: ONE kernel advances all B clouds per
        # iteration (npoint loop overheads instead of B*npoint — the
        # per-scene kernel's grid cells execute sequentially on the
        # TensorCore; ops/fps_batched_pallas.py, bit-identical indices)
        from lsdm_tpu.ops.fps_batched_pallas import \
            farthest_point_sample_batched
        return farthest_point_sample_batched(
            jax.lax.stop_gradient(xyz), npoint, farthest0,
            interpret=jax.default_backend() == "cpu")

    def body(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        dist = jnp.sum((xyz - centroid) ** 2, -1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        nxt = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return (distance, nxt), farthest

    init = (jnp.full((B, N), 1e10, jnp.float32), farthest0)
    _, idx = jax.lax.scan(body, init, None, length=npoint)
    return jnp.transpose(idx)  # (B, npoint)


def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
    impl: str = "topk",
) -> jax.Array:
    """Fixed-size ball query (B, S, nsample) of point indices.

    Replicates reference semantics exactly (``pointnet2_utils.py:84-104``):
    indices *sorted by index* (not by distance) within the radius; slots
    beyond the in-radius count repeat the first in-radius index.

    Four equivalent formulations, picked per execution context (PERF.md
    round-3 on-chip timings at sa1 train shapes in parentheses):

    * impl="topk" (15.5 ms): mask + ``lax.top_k`` of negated indices.  On a
      single chip TPU's TopK custom call is fast — but it has no SPMD rule,
      so under a sharded object axis the partitioner all-gathers the full
      (B, S, N) tensor per device and sorts it redundantly (302 MB at the
      flagship config).  Single-chip default.
    * impl="topk_p": the same computation through :func:`topk_rows`, which
      carries a ``custom_partitioning`` rule — per-shard TopK custom call,
      zero collectives.  Sharded-context default.
    * impl="topk2": hierarchical selection (:func:`smallest_k2`) — chunked
      local top-k plus a short merge sort replaces the full 1024-wide
      sort.  Identical results (unique iota candidates).
    * impl="pallas": fused Pallas kernel (ops/ballquery_pallas.py) — the
      (BS, N) distance block stays in VMEM and selection is nsample
      iterated row-min passes (the minimum of ``where(in_radius, iota,
      N)`` IS the next index; no sort, no HBM round-trip).  Falls back to
      "topk2c" when S is not a multiple of 8.  Train-time TPU default
      since round 4 (resolve_train_ball_impl).
    * impl="topk2c": hierarchical selection with the distance tensor
      computed NATIVELY in chunked (B, S, N/128, 128) layout — one
      ``dot_general`` emits the chunked shape directly, so the chunk split
      is free instead of a reshape of the fused (B, S, N) producer (the
      reshape is what regressed plain "topk2" in composed programs,
      PERF.md round 3).  Identical results to "topk" (candidate values are
      unique global indices).  Falls back to "topk" when N < 256 or N is
      not a multiple of 128.
    * impl="scatter" (272 ms): "first nsample in-radius indices" is a
      prefix count — rank in-radius points with a ``cumsum`` and scatter
      each index into its slot (row-wise vmapped scatter).  O(N), no sort,
      partitions with zero collectives; TPU serializes the scatter.
    * impl="binsearch" (399 ms): the in-radius rank ``cumsum`` is
      nondecreasing along N, so "the k-th in-radius index" is
      ``searchsorted(cumsum, k+1)`` — ceil(log2(N+1)) rounds of a
      (B, S, nsample) batched gather.  Elegant, partitions cleanly, and
      slow: 11 rounds of random-access gather is the one memory pattern
      the TPU cannot pipeline (the cumsum itself is only 0.8 ms).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if impl == "pallas":
        if S % 8:
            # query-block rows must tile the sublane dim; fall to the
            # next-fastest measured formulation (topk2c declines on its
            # own to topk when N gives it nothing to split)
            impl = "topk2c"
        else:
            from lsdm_tpu.ops.ballquery_pallas import query_ball_point_pallas
            # indices are non-differentiable in EVERY formulation (the
            # topk path's integer outputs carry no gradient either), but
            # pallas_call has no autodiff rule at all — stop_gradient on
            # the inputs makes the kernel usable inside a differentiated
            # training step (round 4; gradients reach xyz through the
            # gather/MLP path, exactly as with topk)
            return query_ball_point_pallas(
                radius, min(nsample, N), jax.lax.stop_gradient(xyz),
                jax.lax.stop_gradient(new_xyz),
                interpret=jax.default_backend() == "cpu")
    if impl == "topk2c" and (N < 256 or N % 128):
        impl = "topk"  # hierarchy has nothing to split
    if impl == "topk2c":
        # chunked-native distances: contraction over the 3 coords with
        # free dims (S) x (chunk, lane) — the dot emits (B, S, C, 128)
        # without ever materializing a (B, S, N) operand, so the local
        # top-k runs on the producer's own layout (lane-aligned chunks).
        ch = 128
        C = N // ch
        k = nsample
        xyz_c = xyz.reshape(B, C, ch, 3).astype(jnp.float32)
        q = new_xyz.astype(jnp.float32)
        d = -2.0 * jnp.einsum(
            "bsd,bcmd->bscm", q, xyz_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = d + jnp.sum(q**2, -1)[:, :, None, None]
        d = d + jnp.sum(xyz_c**2, -1)[:, None, :, :]
        # candidate values ARE global indices (unique), N when out of radius
        gidx = (
            jax.lax.broadcasted_iota(jnp.int32, (B, S, C, ch), 3)
            + jax.lax.broadcasted_iota(jnp.int32, (B, S, C, ch), 2) * ch
        )
        cand = jnp.where(d > radius**2, N, gidx)
        neg_local, _ = jax.lax.top_k(-cand, k)  # (B, S, C, k) k smallest
        neg_topk, _ = jax.lax.top_k(neg_local.reshape(B, S, C * k), k)
        group_idx = jnp.sort(-neg_topk, axis=-1)
        group_first = group_idx[:, :, :1]
        group_idx = jnp.where(group_idx == N, group_first, group_idx)
        return jnp.clip(group_idx, 0, N - 1)
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    if impl == "topk_p":
        # partitioned top_k: the fast single-chip path, minus the SPMD
        # all-gather (topk_rows) — the sharded-context default
        arange = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2), (B, S, N)
        )
        cand = jnp.where(sqrdists > radius**2, N, arange)
        neg_topk, _ = topk_rows(-cand, nsample)
        group_idx = jnp.sort(-neg_topk, axis=-1)
    elif impl == "binsearch":
        mask = sqrdists <= radius**2  # (B, S, N)
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # (B, S, N)
        target = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # k-th -> rank k+1
        target = jnp.broadcast_to(target, (B, S, nsample))
        # Leftmost n with cum[n] >= target, else N: classic lower-bound
        # binary search, vectorized over all (B, S, nsample) queries.
        lo = jnp.zeros((B, S, nsample), jnp.int32)
        hi = jnp.full((B, S, nsample), N, jnp.int32)
        for _ in range(max(1, (N).bit_length())):  # 2^rounds >= N+1 halvings
            mid = (lo + hi) // 2
            v = jnp.take_along_axis(cum, jnp.minimum(mid, N - 1), axis=-1)
            open_ = lo < hi
            found = v >= target
            hi = jnp.where(open_ & found, mid, hi)
            lo = jnp.where(open_ & ~found, mid + 1, lo)
        group_idx = hi  # == lo; N where fewer than k in-radius points
    elif impl in ("topk", "topk2"):
        arange = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2), (B, S, N)
        )
        cand = jnp.where(sqrdists > radius**2, N, arange)
        if impl == "topk2":
            # hierarchical selection: chunk-local top-k then a short merge
            # sort, instead of one full-width sort (smallest_k2)
            group_idx, _ = smallest_k2(cand, nsample)
        else:
            # top_k of negated values = nsample smallest; ties keep lowest
            # index order because iota values are unique.
            neg_topk, _ = jax.lax.top_k(-cand, nsample)
            group_idx = -neg_topk
            group_idx = jnp.sort(group_idx, axis=-1)
    else:
        mask = sqrdists <= radius**2  # (B, S, N)
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # 1-indexed
        # slot for each in-radius point among the first nsample; the rest
        # (and all out-of-radius points) dump into an extra slot
        pos = jnp.where(mask & (rank <= nsample), rank - 1, nsample)
        src = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2), (B, S, N)
        )

        # Row-wise scatter via vmap (scatter batching dims), NOT explicit
        # (B, S, N) batch-index arrays: the latter defeat the partitioner,
        # which all-gathers the s32 index/update tensors (the 57 MB gathers
        # in the midsize audit).  The vmapped form lowers with zero
        # collectives on a sharded batch dim.
        def scatter_row(p, s):
            return jnp.full((nsample + 1,), N, jnp.int32).at[p].set(s)

        buf = jax.vmap(jax.vmap(scatter_row))(pos, src)
        group_idx = buf[..., :nsample]  # ascending by construction
    group_first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, group_first, group_idx)
    # Degenerate case (no point in radius): reference leaves N (an OOB index
    # that torch gathers garbage for); we clamp to 0 for safety.
    return jnp.clip(group_idx, 0, N - 1)


def _topk_rows_factory():
    """Build the partitioned row-wise top_k (module-level singleton so every
    caller shares one custom-call registration).

    ``lax.top_k`` has no SPMD rule: under a sharded batch axis the
    partitioner all-gathers the whole operand and sorts it redundantly on
    every device (the 302 MB all-gather of PERF.md round 3).  But top_k is
    row-wise — batch dims are embarrassingly parallel — so this wrapper
    teaches it the missing rule via ``custom_partitioning``: keep any
    sharding on the leading dims, require only the last (row) dim and the
    tiny k dim replicated, and run the fast TopK custom call on each
    device's local shard.  Measured: the prefix-count scatter and
    binary-search reformulations that avoid top_k cost 272 / 399 ms at sa1
    train shapes vs 15.5 ms for TopK (PERF.md) — partitioning the fast op
    beats reformulating around it.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _row_replicated(sharding, ndim):
        spec = tuple(sharding.spec[: ndim - 1])
        spec = spec + (None,) * (ndim - len(spec))
        return NamedSharding(sharding.mesh, PartitionSpec(*spec))

    def _impl(x, k):
        return jax.lax.top_k(x, k)

    f = custom_partitioning(_impl, static_argnums=(1,))

    # static_argnums args (k) are prepended to every callback
    def _infer(k, mesh, arg_shapes, result_shape):
        s = _row_replicated(arg_shapes[0].sharding, len(arg_shapes[0].shape))
        return [s, s]  # list: must match the out_tree structure

    def _partition(k, mesh, arg_shapes, result_shape):
        arg_sh = (_row_replicated(arg_shapes[0].sharding,
                                  len(arg_shapes[0].shape)),)
        out_sh = [arg_sh[0], arg_sh[0]]
        return mesh, lambda x: jax.lax.top_k(x, k), out_sh, arg_sh

    f.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        # shardy path: batch factors pass through; the row dim n and the
        # result dim k must stay replicated on every shard
        sharding_rule="... n -> ... k, ... k",
        need_replication_factors=("n", "k"),
    )
    return f


_TOPK_ROWS = None


def _topk_rows_raw(x, k):
    global _TOPK_ROWS
    if _TOPK_ROWS is None:
        _TOPK_ROWS = _topk_rows_factory()
    return _TOPK_ROWS(x, k)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def topk_rows(x: jax.Array, k: int):
    """``lax.top_k`` with batch-dim partitioning (values, indices).

    Identical results to ``lax.top_k``; under a sharded leading axis it
    partitions instead of all-gathering (see :func:`_topk_rows_factory`).
    The custom-partitioning primitive has no autodiff rule, so this wraps
    it with top_k's own VJP (value cotangents scatter back to their source
    positions; needed when a DGCNN dynamic graph is built on
    param-dependent features).
    """
    return _topk_rows_raw(x, k)


def _topk_rows_fwd(x, k):
    vals, idx = _topk_rows_raw(x, k)
    return (vals, idx), (idx, x.shape[-1])


def _topk_rows_bwd(k, res, ct):
    idx, n = res
    ct_vals = ct[0]  # idx cotangent is symbolic-zero (int output)
    gx = jnp.zeros(idx.shape[:-1] + (n,), ct_vals.dtype)
    return (jnp.put_along_axis(gx, idx, ct_vals, axis=-1,
                               inplace=False),)


topk_rows.defvjp(_topk_rows_fwd, _topk_rows_bwd)


def smallest_k(d: jax.Array, k: int):
    """(values, indices) of the k smallest entries along the last axis,
    ascending, ties to the lowest index — ``lax.top_k(-d, k)`` semantics
    without ``top_k``: k iterated argmin+mask passes.  For tiny k this is
    k cheap reductions instead of a sort, and (unlike the TopK custom call,
    which has no SPMD rule) it partitions cleanly on sharded batch dims.
    """
    vals, idxs = [], []
    remaining = d
    for _ in range(k):
        i = jnp.argmin(remaining, axis=-1)  # first occurrence on ties
        v = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        remaining = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
            == i[..., None], jnp.inf, remaining)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


def smallest_k2(d: jax.Array, k: int, chunk: int = 128,
                topk_fn=jax.lax.top_k):
    """Two-level (hierarchical) k-smallest along the last axis —
    ``smallest_k`` semantics (ascending values, ties to the lowest index)
    at a fraction of the sort cost.

    TPU's TopK custom call sorts the full row; at N=1024 that sort IS the
    ball-query cost (PERF.md round 3: 15.5 ms at sa1 train shapes).  But
    at most ``k`` of the global k-smallest can live in any one chunk, so:
    split the row into ``chunk``-wide pieces, take each piece's local
    k-smallest (narrow sorts), then select the global k among the
    ``ceil(N/chunk)*k`` survivors (one short sort).

    Tie-breaking stays exact: survivors are laid out chunk-major then
    rank-major, so for equal values the lowest merged position is the
    lowest global index — the same rule as ``top_k`` on the full row.

    ``topk_fn`` lets a sharded caller substitute :func:`topk_rows` so both
    levels keep their partitioning.
    """
    *lead, N = d.shape
    kk = min(k, N)
    C = -(-N // chunk)
    if C <= 1 or k >= chunk:
        neg, idx = topk_fn(-d, kk)
        return -neg, idx
    pad = C * chunk - N
    if pad:
        fill = (jnp.iinfo(d.dtype).max if jnp.issubdtype(d.dtype, jnp.integer)
                else jnp.inf)
        d = jnp.pad(d, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=fill)
    dc = d.reshape(*lead, C, chunk)
    neg_local, local_idx = topk_fn(-dc, kk)  # (..., C, kk)
    base = (jnp.arange(C, dtype=jnp.int32) * chunk)[:, None]
    global_idx = (local_idx + base).reshape(*lead, C * kk)
    neg_vals, pos = topk_fn(neg_local.reshape(*lead, C * kk), kk)
    idx = jnp.take_along_axis(global_idx, pos, axis=-1)
    return -neg_vals, idx


def knn(x: jax.Array, k: int, impl: str = "topk") -> jax.Array:
    """k-nearest-neighbour indices (B, N, k) by negative squared distance
    (reference ``model/pcd_backbone/dgcnn.py:21-27``).

    ``impl`` as in :func:`query_ball_point`: "argmin" (:func:`smallest_k`)
    partitions under a sharded batch axis (k reduction passes, so only
    preferable when sharded)."""
    d = square_distance(x, x)
    if impl == "topk":
        _, idx = jax.lax.top_k(-d, k)
    elif impl == "topk_p":
        _, idx = topk_rows(-d, k)
    elif impl == "topk2":
        _, idx = smallest_k2(d, k)
    else:
        _, idx = smallest_k(d, k)
    return idx


def _interp_gather(points2, idx, gather_bwd):
    """The FP interpolation feature gather in the selected formulation
    (mirrors the SetAbstraction grouping gather's gather_bwd choices)."""
    if gather_bwd == "scatter":
        return index_points(points2, idx)
    return index_points_mm(points2, idx, points2.shape[1],
                           "matmul" if gather_bwd == "matmul_fwd"
                           else "gather")


def three_nn_interpolate(
    xyz1: jax.Array, xyz2: jax.Array, points2: jax.Array, eps: float = 1e-8,
    impl: str = "topk", diff_weights: bool = False,
    gather_bwd: str = "scatter",
) -> jax.Array:
    """Inverse-distance-weighted 3-NN feature interpolation.

    Reference ``PointNetFeaturePropagation.forward``
    (``pointnet2_utils.py:290-300``): features ``points2`` living on ``xyz2``
    are interpolated onto ``xyz1`` using the 3 nearest neighbours.

    ``impl`` as in :func:`query_ball_point`: "topk" for single-chip speed,
    "argmin" (:func:`smallest_k`) under a sharded batch axis.

    ``diff_weights``: make the "pallas" path train-legal (round 4).  The
    kernel has no VJP, but the reference training graph's gradients flow
    ONLY through the selected distance VALUES at fixed indices (top_k's
    backward scatters cotangents of the k selected entries — the
    selection permutation itself is a constant of the linearization).
    So: indices from the kernel under stop_gradient, then the k
    distances are recomputed differentiably as ``||x1 - x2[idx]||^2`` —
    mathematically the same values and the same gradient chain as the
    composed formulation, without ever materializing the (B, N, S)
    distance tensor.  Pinned against the composed gradients in
    tests/test_pointcloud_ops.py.

    ``gather_bwd``: formulation of the feature gather, as in
    :class:`...pointnet2.PointNetSetAbstraction` — "scatter" (exact
    take-along + XLA scatter-add backward, the eval default, trace-
    identical to round-3 programs) or "matmul"/"matmul_fwd" (one-hot MXU
    contraction backward / both directions — the train formulations).

    xyz1: (B, N, 3); xyz2: (B, S, 3); points2: (B, S, C) -> (B, N, C).
    """
    k = min(3, xyz2.shape[1])  # reference always has S>=16; tiny configs don't
    if impl == "pallas" and xyz1.shape[1] % 8 == 0:
        # fused distances + k min-passes in VMEM (ops/ballquery_pallas.py)
        from lsdm_tpu.ops.ballquery_pallas import three_nn_pallas
        dists, idx = three_nn_pallas(
            jax.lax.stop_gradient(xyz1), jax.lax.stop_gradient(xyz2), k,
            interpret=jax.default_backend() == "cpu")
        if diff_weights:
            # differentiable recompute at the fixed indices; the direct
            # squared-difference form avoids the |x|^2+|y|^2-2xy
            # cancellation entirely (it is MORE accurate than the
            # HIGHEST-precision expansion the composed path needs)
            nb = index_points(xyz2, idx)  # (B, N, k, 3)
            dists = jnp.sum(
                (xyz1[:, :, None, :].astype(jnp.float32)
                 - nb.astype(jnp.float32)) ** 2, axis=-1)
        dist_recip = 1.0 / (dists + eps)
        norm = jnp.sum(dist_recip, axis=2, keepdims=True)
        weight = dist_recip / norm
        gathered = _interp_gather(points2, idx, gather_bwd)  # (B, N, k, C)
        return jnp.sum(gathered * weight[..., None], axis=2)
    d = square_distance(xyz1, xyz2)  # (B, N, S)
    if impl == "topk" or impl == "pallas":  # fast single-chip custom call
        neg_top, idx = jax.lax.top_k(-d, k)
        dists = -neg_top
    elif impl == "topk_p":  # partitioned top_k (topk_rows)
        neg_top, idx = topk_rows(-d, k)
        dists = -neg_top
    elif impl == "topk2":  # hierarchical selection (smallest_k2)
        dists, idx = smallest_k2(d, k)
    else:  # "argmin": k reduction passes; partitions cleanly
        dists, idx = smallest_k(d, k)
    dist_recip = 1.0 / (dists + eps)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    gathered = _interp_gather(points2, idx, gather_bwd)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
