"""Contact-reconstruction metrics (reference ``posa/general_utils.py``).

Used by the POSA / ContactFormer lineage: masked cross-entropy + accuracy
over contact classes, IoU / F1 / TPR / TNR on binarized contact, and the
neighborhood-consistency metric.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lsdm_tpu.ops.pointcloud import square_distance


def compute_recon_loss(
    gt_batch: jax.Array,  # (B, V) int class labels (or (B, V, C) one-hot)
    pr_batch: jax.Array,  # (B, V, C) logits
    mask: Optional[jax.Array] = None,  # (B, V)
    reduction: str = "mean",
) -> Tuple[jax.Array, jax.Array]:
    """Masked CE + argmax accuracy over contact classes
    (reference ``general_utils.py:7-29``)."""
    if gt_batch.ndim == pr_batch.ndim:
        gt = jnp.argmax(gt_batch, -1)
    else:
        gt = gt_batch.astype(jnp.int32)
    logp = jax.nn.log_softmax(pr_batch, axis=-1)
    nll = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]  # (B, V)
    pred = jnp.argmax(pr_batch, -1)
    correct = (pred == gt).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        loss = (nll * m).sum() / denom
        acc = (correct * m).sum() / denom
    else:
        loss = nll.mean() if reduction == "mean" else nll.sum()
        acc = correct.mean()
    return loss, acc


def _binarize(x: jax.Array) -> jax.Array:
    """Contact = class > 0 (class 0 is 'no contact')."""
    return (x > 0).astype(jnp.float32)


def compute_iou(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """IoU of binarized contact (reference ``general_utils.py:67-74``)."""
    g, p = _binarize(gt), _binarize(pred)
    inter = jnp.sum(g * p)
    union = jnp.sum(jnp.clip(g + p, 0, 1))
    return jnp.where(union > 0, inter / union, 1.0)


def compute_f1_score(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """(reference ``general_utils.py:76-94``)"""
    g, p = _binarize(gt), _binarize(pred)
    tp = jnp.sum(g * p)
    fp = jnp.sum((1 - g) * p)
    fn = jnp.sum(g * (1 - p))
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    return jnp.where(
        precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0
    )


def compute_tpr(gt: jax.Array, pred: jax.Array) -> jax.Array:
    g, p = _binarize(gt), _binarize(pred)
    tp = jnp.sum(g * p)
    fn = jnp.sum(g * (1 - p))
    return tp / jnp.maximum(tp + fn, 1.0)


def compute_tnr(gt: jax.Array, pred: jax.Array) -> jax.Array:
    g, p = _binarize(gt), _binarize(pred)
    tn = jnp.sum((1 - g) * (1 - p))
    fp = jnp.sum((1 - g) * p)
    return tn / jnp.maximum(tn + fp, 1.0)


def compute_consistency_metric(
    verts: jax.Array,  # (V, 3)
    labels: jax.Array,  # (V,) int contact classes
    eps: float = 0.1,
    num_classes: int = 8,
) -> jax.Array:
    """Fraction of contact points whose label disagrees with the mode of
    their eps-neighborhood (reference ``general_utils.py:121-146``)."""
    d2 = square_distance(verts[None], verts[None])[0]  # (V, V)
    nbr = d2 <= eps**2  # includes self
    onehot = jax.nn.one_hot(labels, num_classes)  # (V, C)
    counts = nbr.astype(jnp.float32) @ onehot  # (V, C) label histogram
    mode = jnp.argmax(counts, -1)
    contact = labels > 0
    disagree = (mode != labels) & contact
    denom = jnp.maximum(jnp.sum(contact), 1)
    return jnp.sum(disagree) / denom
