"""ATISS / MIME autoregressive scene transformers (flax).

Re-design of the reference's vendored NVIDIA ATISS stack
(``atiss/scene_synthesis/networks/``):

  * :class:`AutoregressiveTransformer` — torch-style post-LN transformer
    encoder (d_model 512, gelu) over box tokens: per-property fixed
    positional encodings (class 64 + pos 3x64 + size 3x64 + angle 64 = 512),
    a room-layout feature start token and a learned empty token
    (``autoregressive_transformer.py:97-141``).  NOTE the reference applies
    NO attention mask despite the "causal masking" comment (:139-140) —
    reproduced faithfully.
  * :class:`MIME` — adds a contact-label channel (1 -> 16) making
    d_model 528 (``mime.py:5-64``).
  * :class:`AutoregressiveDMLLHead` — chained property head: class logits ->
    translation -> angle -> size, each conditioned on the previous
    (``hidden_to_output.py:53-306``).  Two modes:
      - ``scalar_head=True`` (default): the LSDM fork's modified ``_mlp``
        that ends in Linear(out, 1) (``hidden_to_output.py:104-115``), i.e.
        scalar regression per property — this is what
        ``run/train_atiss.py:78-87`` trains with MSE+CE;
      - ``scalar_head=False``: the original DMLL parameterization
        (n_mixtures * 3 outputs) with :func:`sample_from_dmll` sampling and
        :func:`dmll` loss.
  * losses: :func:`dmll` (discretized mixture of logistics,
    ``losses/__init__.py:39``), :func:`mmd` (``losses/mmd.py:46``).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lsdm_tpu.ops.attention import TorchLinear, multihead_attention


def fixed_positional_encoding(x: jax.Array, proj_dims: int = 64, val: float = 0.1):
    """sin/cos at fixed frequencies (reference ``base.py:13-26``).
    x: (..., 1) -> (..., proj_dims)."""
    ll = proj_dims // 2
    exb = 2 * jnp.linspace(0, ll - 1, ll) / proj_dims
    sigma = 2 * jnp.pi / jnp.power(val, exb)
    return jnp.concatenate([jnp.sin(x * sigma), jnp.cos(x * sigma)], axis=-1)


class TorchTransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer parity (post-LN, gelu)."""

    d_model: int
    n_heads: int
    dim_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 attn_bias: jax.Array | None = None) -> jax.Array:
        E = self.d_model
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * E, E), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,), jnp.float32)
        proj = x @ in_w.T + in_b
        q, k, v = jnp.split(proj, 3, axis=-1)
        # attn_bias: additive (L, S) or (B*H, L, S) mask (key-padding etc.)
        attn, _ = multihead_attention(q, k, v, self.n_heads, attn_mask=attn_bias,
                                      dtype=self.dtype)
        attn = TorchLinear(E, dtype=self.dtype, name="attn_out_proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        h = TorchLinear(self.dim_ff, dtype=self.dtype, name="linear1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = TorchLinear(E, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class RoomFeatureExtractor(nn.Module):
    """Room-layout mask (B, 64, 64, C) -> (B, feature_size) features.

    Stands in for the reference's ResNet18/AlexNet extractors
    (``feature_extractors.py``): a compact strided CNN.  The LSDM training
    path feeds a constant all-ones layout (``run/train_atiss.py:68``), so
    the extractor only contributes a learned bias there; the full conv
    stack matters for real 3D-FRONT layouts.
    """

    feature_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, room_mask: jax.Array) -> jax.Array:
        x = room_mask.astype(self.dtype)
        if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        for i, feats in enumerate((16, 32, 64, 128)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.feature_size, dtype=self.dtype, name="fc")(x)


class BBoxPrediction(NamedTuple):
    """Prediction container (reference ``AutoregressiveBBoxOutput.members``
    ordering, ``bbox_output.py:70-80``)."""

    sizes_x: jax.Array
    sizes_y: jax.Array
    sizes_z: jax.Array
    translations_x: jax.Array
    translations_y: jax.Array
    translations_z: jax.Array
    angles: jax.Array
    class_labels: jax.Array

    @property
    def members(self):
        return tuple(self)


class _PropertyMLP(nn.Module):
    """Property head (reference ``AutoregressiveDMLL._mlp``).

    scalar=True  -> ...Linear(h, out), ReLU, Linear(out, 1)  (LSDM fork)
    scalar=False -> ...Linear(h, out)                         (original DMLL)
    """

    out_size: int
    scalar: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        x = nn.relu(TorchLinear(2 * h, dtype=self.dtype, name="0")(x))
        x = nn.relu(TorchLinear(h, dtype=self.dtype, name="2")(x))
        x = TorchLinear(self.out_size, dtype=self.dtype, name="4")(x)
        if self.scalar:
            x = nn.relu(x)
            x = TorchLinear(1, dtype=self.dtype, name="6")(x)
        return x


class _ExtraFC(nn.Module):
    """Optional pre-head MLP (reference ``Hidden2Output.hidden2output``,
    ``hidden_to_output.py:23-29``): Linear(h,2h),ReLU,Linear(2h,h),ReLU.
    Reference quirk: applied only in the training ``forward``
    (``hidden_to_output.py:267-268``), never in the sampling paths —
    reproduced."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        x = nn.relu(TorchLinear(2 * h, dtype=self.dtype, name="0")(x))
        return nn.relu(TorchLinear(h, dtype=self.dtype, name="2")(x))


class AutoregressiveDMLLHead(nn.Module):
    """(reference ``AutoregressiveDMLL``, ``hidden_to_output.py:53-306``)"""

    n_classes: int
    n_mixtures: int = 10
    scalar_head: bool = True
    hidden_size: int = 512
    with_extra_fc: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        out = 1 if self.scalar_head else self.n_mixtures * 3
        # note: _PropertyMLP's internal out_size mirrors the torch Sequential
        # (n_mixtures*3 wide before the optional scalar collapse)
        self.class_layer = TorchLinear(self.n_classes, dtype=self.dtype)
        self.fc_class_labels = TorchLinear(64, dtype=self.dtype)
        mk = lambda: _PropertyMLP(self.n_mixtures * 3, self.scalar_head, self.dtype)
        self.centroid_layer_x = mk()
        self.centroid_layer_y = mk()
        self.centroid_layer_z = mk()
        self.angle_layer = mk()
        self.size_layer_x = mk()
        self.size_layer_y = mk()
        self.size_layer_z = mk()
        if self.with_extra_fc:
            self.hidden2output = _ExtraFC(self.dtype)

    def _chain_features(self, x, class_labels, translations=None, angles=None):
        c = self.fc_class_labels(class_labels)
        cf = jnp.concatenate([x, c], axis=-1)
        if translations is None:
            return cf
        tx = fixed_positional_encoding(translations[..., 0:1])
        ty = fixed_positional_encoding(translations[..., 1:2])
        tz = fixed_positional_encoding(translations[..., 2:3])
        tf = jnp.concatenate([cf, tx, ty, tz], axis=-1)
        if angles is None:
            return tf
        a = fixed_positional_encoding(angles)
        return jnp.concatenate([tf, a], axis=-1)

    def __call__(self, x: jax.Array, targets: Dict[str, jax.Array]) -> BBoxPrediction:
        """Training path (reference ``forward``, ``hidden_to_output.py:266-306``):
        each property conditioned on the TARGET values of the previous."""
        if self.with_extra_fc:
            x = self.hidden2output(x)
        class_labels_tr = targets["class_labels_tr"].astype(jnp.float32)
        translations_tr = targets["translations_tr"].astype(jnp.float32)
        angles_tr = targets["angles_tr"].astype(jnp.float32)

        class_logits = self.class_layer(x)
        cf = self._chain_features(x, class_labels_tr)
        t = (self.centroid_layer_x(cf), self.centroid_layer_y(cf),
             self.centroid_layer_z(cf))
        tf = self._chain_features(x, class_labels_tr, translations_tr)
        angles = self.angle_layer(tf)
        sf = self._chain_features(x, class_labels_tr, translations_tr, angles_tr)
        s = (self.size_layer_x(sf), self.size_layer_y(sf), self.size_layer_z(sf))
        return BBoxPrediction(
            sizes_x=s[0], sizes_y=s[1], sizes_z=s[2],
            translations_x=t[0], translations_y=t[1], translations_z=t[2],
            angles=angles, class_labels=class_logits,
        )

    # --- sampling path (reference sample_class_labels/... :166-226) ---

    def pred_class_probs(self, x: jax.Array) -> jax.Array:
        return jax.nn.softmax(self.class_layer(x), axis=-1)

    def sample_class_labels(self, x: jax.Array, key: jax.Array) -> jax.Array:
        logits = self.class_layer(x)
        B, L, C = logits.shape
        idx = jax.random.categorical(key, logits.reshape(B * L, C))
        return jax.nn.one_hot(idx, C).reshape(B, L, C)

    def _sample_value(self, pred: jax.Array, key: jax.Array) -> jax.Array:
        """Scalar heads return the value; DMLL heads sample the mixture
        (reference ``sample_from_dmll``, ``base.py:27-51``)."""
        if self.scalar_head:
            return pred
        B, L, C = pred.shape
        p = pred.reshape(B * L, C)
        return sample_from_dmll(p, key).reshape(B, L, 1)

    def sample_translations(self, x, class_labels, key):
        cf = self._chain_features(x, class_labels)
        ks = jax.random.split(key, 3)
        return jnp.concatenate(
            [
                self._sample_value(self.centroid_layer_x(cf), ks[0]),
                self._sample_value(self.centroid_layer_y(cf), ks[1]),
                self._sample_value(self.centroid_layer_z(cf), ks[2]),
            ],
            axis=-1,
        )

    def sample_angles(self, x, class_labels, translations, key):
        tf = self._chain_features(x, class_labels, translations)
        return self._sample_value(self.angle_layer(tf), key)

    def sample_sizes(self, x, class_labels, translations, angles, key):
        sf = self._chain_features(x, class_labels, translations, angles)
        ks = jax.random.split(key, 3)
        return jnp.concatenate(
            [
                self._sample_value(self.size_layer_x(sf), ks[0]),
                self._sample_value(self.size_layer_y(sf), ks[1]),
                self._sample_value(self.size_layer_z(sf), ks[2]),
            ],
            axis=-1,
        )

    def pred_dmll_params_translation(self, x, class_labels):
        """(reference ``hidden_to_output.py:240-264``; meaningful only with
        scalar_head=False)"""
        cf = self._chain_features(x, class_labels)

        def unpack(pred):
            B, L, C = pred.shape
            p = pred.reshape(B * L, C)
            nr = C // 3
            probs = jax.nn.softmax(p[:, :nr], axis=-1)
            means = p[:, nr : 2 * nr]
            scales = jax.nn.elu(p[:, 2 * nr :]) + 1.0001
            return probs, means, scales

        return (
            unpack(self.centroid_layer_x(cf)),
            unpack(self.centroid_layer_y(cf)),
            unpack(self.centroid_layer_z(cf)),
        )


def sample_from_dmll(pred: jax.Array, key: jax.Array, num_classes: int = 256):
    """Sample a mixture of logistics (reference ``base.py:27-51``).
    pred: (N, 3*nr_mix) -> (N, 1) clipped to [-1, 1]."""
    N, C = pred.shape
    nr = C // 3
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, pred[:, :nr])
    means = jnp.take_along_axis(pred[:, nr : 2 * nr], idx[:, None], 1)[:, 0]
    scales = jax.nn.elu(
        jnp.take_along_axis(pred[:, 2 * nr :], idx[:, None], 1)[:, 0]
    ) + 1.0001
    u = jax.random.uniform(k2, (N,), minval=1e-5, maxval=1 - 1e-5)
    out = means + scales * (jnp.log(u) - jnp.log(1 - u))
    return jnp.clip(out, -1, 1)[:, None]


def dmll(pred: jax.Array, target: jax.Array, log_scale_min: float = -7.0,
         num_classes: int = 256) -> jax.Array:
    """Discretized mixture-of-logistics NLL (reference
    ``losses/__init__.py:39-``; inputs scaled to [-1, 1]).
    pred: (B, L, 3*nr_mix); target: (B, L, 1) -> scalar mean NLL."""
    nr = pred.shape[-1] // 3
    logit_probs = pred[..., :nr]
    means = pred[..., nr : 2 * nr]
    log_scales = jnp.maximum(pred[..., 2 * nr :], log_scale_min)

    centered = target - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2),
    )
    log_probs = jnp.where(
        target < -0.999,
        log_cdf_plus,
        jnp.where(target > 0.999, log_one_minus_cdf_min, inner),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def mmd(x: jax.Array, y: jax.Array, sigma: float = 1.0) -> jax.Array:
    """Gaussian-kernel maximum mean discrepancy (reference ``losses/mmd.py:46``)."""

    def k(a, b):
        d = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        return jnp.exp(-d / (2 * sigma**2))

    return jnp.mean(k(x, x)) + jnp.mean(k(y, y)) - 2 * jnp.mean(k(x, y))


class AutoregressiveTransformer(nn.Module):
    """(reference ``AutoregressiveTransformer``,
    ``autoregressive_transformer.py:97-227``)"""

    n_classes: int
    n_layers: int = 4
    n_heads: int = 8
    dim_ff: int = 1024
    hidden_dims: int = 512
    n_mixtures: int = 10
    scalar_head: bool = True
    feature_size: int = 64
    contact: bool = False  # True -> MIME (d_model 528, mime.py:5-64)
    # "simple" (compact CNN), "resnet18" or "alexnet" (faithful torchvision
    # topologies, feature_extractors.py; reference default is resnet18 with
    # freeze_bn=True, atiss networks/__init__.py:77-81)
    feature_extractor_name: str = "simple"
    freeze_bn: bool = True
    # Reproduce the LSDM fork's transformer-axis bug: the vendored ATISS
    # swaps fast_transformers for torch ``nn.TransformerEncoder`` but keeps
    # feeding batch-first (B, L, E) tensors while torch defaults to
    # ``batch_first=False`` (``autoregressive_transformer.py:20-24,140``) —
    # so self-attention actually runs over the BATCH axis (scenes at the
    # same slot attend to each other; with B=1 every token only attends to
    # itself).  LSDM's ATISS/MIME baselines were trained this way
    # (``run/train_atiss.py:74``), so converted baseline checkpoints need
    # this flag; default False = the intended (upstream-ATISS) token-axis
    # attention, which is also the sane TPU design.
    torch_seq_axis_quirk: bool = False
    # per-property sinusoidal-encoding / class-projection widths — 64 in the
    # base class (base.py:13-26, :129); the PE variant narrows both to 60 to
    # make room for its learned slot embedding
    prop_pe_dims: int = 64
    class_feat_dims: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def d_model(self) -> int:
        return 528 if self.contact else 512

    def setup(self):
        from lsdm_tpu.models.feature_extractors import (
            AlexNetFeatures, ResNet18Features)

        D = self.d_model
        if self.feature_extractor_name == "resnet18":
            self.feature_extractor = ResNet18Features(
                self.feature_size, self.freeze_bn, self.dtype)
        elif self.feature_extractor_name == "alexnet":
            self.feature_extractor = AlexNetFeatures(self.feature_size, self.dtype)
        else:
            self.feature_extractor = RoomFeatureExtractor(self.feature_size,
                                                          self.dtype)
        self.fc_room_f = TorchLinear(D, dtype=self.dtype)
        self.fc_class = TorchLinear(self.class_feat_dims, use_bias=False,
                                    dtype=self.dtype)
        if self.contact:
            self.contact_fc = TorchLinear(16, use_bias=False, dtype=self.dtype)
        self.empty_token_embedding = self.param(
            "empty_token_embedding", nn.initializers.normal(1.0), (1, D), jnp.float32
        )
        # tokens are D=512/528 wide; fc maps them to hidden_dims which is the
        # transformer width (the reference hardcodes d_model=512 and relies
        # on hidden_dims==512 in its configs; parameterizing keeps tiny test
        # configs consistent)
        self.layers = [
            TorchTransformerEncoderLayer(
                self.hidden_dims, self.n_heads, self.dim_ff, dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.fc = TorchLinear(self.hidden_dims, dtype=self.dtype)
        self.hidden2output = AutoregressiveDMLLHead(
            n_classes=self.n_classes,
            n_mixtures=self.n_mixtures,
            scalar_head=self.scalar_head,
            hidden_size=self.hidden_dims,
            dtype=self.dtype,
        )

    def _box_tokens(self, boxes: Dict[str, jax.Array]) -> jax.Array:
        class_f = self.fc_class(boxes["class_labels"].astype(jnp.float32))
        P = self.prop_pe_dims
        tr = boxes["translations"]
        pos_f = jnp.concatenate(
            [fixed_positional_encoding(tr[..., i : i + 1], P) for i in range(3)], -1
        )
        sz = boxes["sizes"]
        size_f = jnp.concatenate(
            [fixed_positional_encoding(sz[..., i : i + 1], P) for i in range(3)], -1
        )
        angle_f = fixed_positional_encoding(boxes["angles"], P)
        feats = [class_f, pos_f, size_f, angle_f]
        if self.contact:
            contact_f = self.contact_fc(boxes["contact_labels"].astype(jnp.float32))
            feats = [contact_f] + feats
        return jnp.concatenate(feats, axis=-1)  # (B, L, d_model)

    def encode(self, boxes: Dict[str, jax.Array], train: bool = False) -> jax.Array:
        """Token sequence -> feature of the *query* position F[:, 1:2]
        (reference ``forward``/``_encode``).

        Optional ``boxes["valid_mask"]`` (B, L): TPU-static alternative to
        the reference's dynamic per-scene slicing (``run/train_atiss.py:53-60``)
        — padded slots are removed from attention with a key-padding bias,
        which is mathematically equivalent to slicing them away.
        """
        B = boxes["class_labels"].shape[0]
        room_f = self.fc_room_f(self.feature_extractor(boxes["room_layout"]))
        X = self._box_tokens(boxes)
        L = X.shape[1]
        start = room_f[:, None, :]
        empty = jnp.broadcast_to(self.empty_token_embedding[None], (B, 1, self.d_model))
        X = jnp.concatenate([start, empty, X], axis=1)
        X = self.fc(X)
        if self.torch_seq_axis_quirk:
            # Swap axes so "sequence" = scenes, exactly like torch sees the
            # reference's batch-first input with batch_first=False.  Padding
            # masks are irrelevant here: tokens never attend to other tokens
            # of the same scene at all.
            X = jnp.swapaxes(X, 0, 1)
            for layer in self.layers:
                X = layer(X, train=train)
            return jnp.swapaxes(X, 0, 1)[:, 1:2]
        attn_bias = None
        if "valid_mask" in boxes and boxes["valid_mask"] is not None:
            valid = jnp.concatenate(
                [jnp.ones((B, 2)), boxes["valid_mask"].astype(jnp.float32)], axis=1
            )  # start + empty tokens always valid
            # (B*H, L+2, L+2) additive bias over keys
            bias = jnp.where(valid > 0, 0.0, -1e9)[:, None, :]  # (B, 1, S)
            bias = jnp.broadcast_to(bias, (B, L + 2, L + 2))
            attn_bias = jnp.tile(bias, (self.n_heads, 1, 1))
        for layer in self.layers:
            X = layer(X, train=train, attn_bias=attn_bias)
        return X[:, 1:2]

    def __call__(self, sample_params: Dict[str, jax.Array], train: bool = False
                 ) -> BBoxPrediction:
        F = self.encode(sample_params, train=train)
        return self.hidden2output(F, sample_params)

    # --- generation (reference autoregressive_decode / generate_boxes) ---

    def decode_step(self, boxes: Dict[str, jax.Array], key: jax.Array
                    ) -> Dict[str, jax.Array]:
        F = self.encode(boxes)
        ks = jax.random.split(key, 4)
        cls = self.hidden2output.sample_class_labels(F, ks[0])
        tr = self.hidden2output.sample_translations(F, cls, ks[1])
        ang = self.hidden2output.sample_angles(F, cls, tr, ks[2])
        sz = self.hidden2output.sample_sizes(F, cls, tr, ang, ks[3])
        return {"class_labels": cls, "translations": tr, "sizes": sz, "angles": ang}

    def decode_step_with_class(self, boxes: Dict[str, jax.Array],
                               class_label: jax.Array, key: jax.Array
                               ) -> Dict[str, jax.Array]:
        """Sample translation/angle/size for a GIVEN class (reference
        ``autoregressive_decode_with_class_label``,
        ``autoregressive_transformer.py:229-259``)."""
        F = self.encode(boxes)
        ks = jax.random.split(key, 3)
        tr = self.hidden2output.sample_translations(F, class_label, ks[0])
        ang = self.hidden2output.sample_angles(F, class_label, tr, ks[1])
        sz = self.hidden2output.sample_sizes(F, class_label, tr, ang, ks[2])
        return {"class_labels": class_label, "translations": tr, "sizes": sz,
                "angles": ang}

    def decode_step_with_class_and_translation(
        self, boxes: Dict[str, jax.Array], class_label: jax.Array,
        translation: jax.Array, key: jax.Array) -> Dict[str, jax.Array]:
        """(reference ``autoregressive_decode_with_class_label_and_translation``,
        ``autoregressive_transformer.py:336-366``)"""
        F = self.encode(boxes)
        ks = jax.random.split(key, 2)
        ang = self.hidden2output.sample_angles(F, class_label, translation, ks[0])
        sz = self.hidden2output.sample_sizes(F, class_label, translation, ang,
                                             ks[1])
        return {"class_labels": class_label, "translations": translation,
                "sizes": sz, "angles": ang}

    def distribution_classes(self, boxes: Dict[str, jax.Array]) -> jax.Array:
        """Class distribution for the next object (used by
        ``scene_completion.py:176-181``)."""
        F = self.encode(boxes)
        return self.hidden2output.pred_class_probs(F)

    def distribution_translations(self, boxes: Dict[str, jax.Array],
                                  class_label: jax.Array):
        """DMLL parameters of the translation distributions for a given class
        (reference ``distribution_translations``,
        ``autoregressive_transformer.py:433-468``); meaningful with
        ``scalar_head=False``."""
        F = self.encode(boxes)
        return self.hidden2output.pred_dmll_params_translation(F, class_label)


class AutoregressiveTransformerPE(AutoregressiveTransformer):
    """Learned-slot-position ATISS variant (reference
    ``AutoregressiveTransformerPE``, ``autoregressive_transformer.py:470-584``),
    REPAIRED — upstream the class cannot execute for any input: ``forward``
    references an undefined ``lengths`` (``:541``, NameError), and the token
    width is internally inconsistent — 60-dim per-property encodings except
    a single 64-dim ``pe_size_z`` outlier (``:491``) give
    60 + 3·60 + (60+60+64) + 60 + 32 = 516-wide box tokens concatenated
    beside the (1, 512) start/empty tokens (``:474-475,534-536``), which
    crashes the cat.  SURVEY.md §2.5 documents the exclusion; this class is
    the evident intent with both bugs fixed: ``pe_size_z`` 64 -> 60 like
    every sibling encoding (the visible typo), making box tokens
    60 (class) + 180 (pos) + 180 (size) + 60 (angle) + 32 (learned slot
    embedding) = 512 = d_model, and masking flows through the base class's
    ``valid_mask`` key-padding bias instead of the undefined ``lengths``.

    vs the base class: property encodings and the class projection are
    60-wide (not 64), and each box slot ``i`` adds a LEARNED 32-dim
    positional embedding (``positional_embedding[i]``, max 32 slots) — the
    token sequence becomes order-aware, which is the variant's point.
    No torch checkpoints of this class can exist (it never ran), so
    ``convert_atiss_state_dict`` intentionally has no mapping for it.
    """

    prop_pe_dims: int = 60
    class_feat_dims: int = 60
    slot_pe_dims: int = 32
    max_seq_length: int = 32  # reference :479

    def setup(self):
        if self.contact:
            raise ValueError("the PE variant is ATISS-only upstream")
        super().setup()
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(1.0),
            (self.max_seq_length, self.slot_pe_dims), jnp.float32,
        )

    def _box_tokens(self, boxes: Dict[str, jax.Array]) -> jax.Array:
        X = super()._box_tokens(boxes)  # (B, L, 480)
        B, L = X.shape[:2]
        if L > self.max_seq_length:
            raise ValueError(
                f"{L} box slots > max_seq_length={self.max_seq_length}")
        pe = jnp.broadcast_to(
            self.positional_embedding[None, :L].astype(X.dtype),
            (B, L, self.slot_pe_dims),
        )
        return jnp.concatenate([X, pe], axis=-1)  # (B, L, 512)


def MIME(n_classes: int, **kw) -> AutoregressiveTransformer:
    """MIME = ATISS + contact channel (reference ``mime.py``).  The encoder
    width follows the 528-wide tokens (``mime.py:19-23`` builds its own
    d_model=528 encoder), so ``hidden_dims`` defaults to 528 here."""
    kw.setdefault("hidden_dims", 528)
    return AutoregressiveTransformer(n_classes=n_classes, contact=True, **kw)


# ---------------------------------------------------------------------------
# Scene-generation APIs (reference ``autoregressive_transformer.py:209-468``).
#
# TPU-first re-design: the reference grows python lists of tensors and
# re-encodes from scratch every step (one CUDA graph per length); here the
# box sequence lives in a fixed-(max_boxes) buffer with a ``valid_mask``
# key-padding bias, so the whole autoregressive loop is ONE compiled
# ``lax.while_loop`` — no per-length recompilation, static shapes throughout.
#
# Box convention: ``boxes`` never materializes the reference's start symbol —
# its class vector never reaches the computation anyway (``_encode`` drops
# token 0, ``autoregressive_transformer.py:158``; training feeds no start
# box, ``run/train_atiss.py:58-64``): ``encode`` prepends the room-feature
# start token and the learned empty token itself.  Returned boxes therefore
# hold only real objects (plus, for add_object parity, the end symbol).


def end_symbol(n_classes: int) -> Dict[str, jax.Array]:
    """(reference ``end_symbol``, ``autoregressive_transformer.py:72-80``)"""
    cls = jnp.zeros((1, 1, n_classes)).at[0, 0, -1].set(1.0)
    return {"class_labels": cls, "translations": jnp.zeros((1, 1, 3)),
            "sizes": jnp.zeros((1, 1, 3)), "angles": jnp.zeros((1, 1, 1))}


def _empty_boxes(B: int, L: int, C: int, contact: bool) -> Dict[str, jax.Array]:
    d = {
        "class_labels": jnp.zeros((B, L, C), jnp.float32),
        "translations": jnp.zeros((B, L, 3), jnp.float32),
        "sizes": jnp.zeros((B, L, 3), jnp.float32),
        "angles": jnp.zeros((B, L, 1), jnp.float32),
        "valid_mask": jnp.zeros((B, L), jnp.float32),
    }
    if contact:
        d["contact_labels"] = jnp.zeros((B, L, 1), jnp.float32)
    return d


def _as_class_onehot(class_label, n_classes: int) -> jax.Array:
    """int | (C,) | (1,1,C) -> (1,1,C) one-hot/float array (reference accepts
    ints and numpy arrays, ``autoregressive_transformer.py:265-274``)."""
    if jnp.ndim(class_label) == 0:
        return jax.nn.one_hot(jnp.asarray(class_label, jnp.int32),
                              n_classes)[None, None]
    arr = jnp.asarray(class_label, jnp.float32)
    return arr.reshape(1, 1, n_classes)


def _autoregressive_fill(model, variables, boxes, key, start: jax.Array,
                         limit: int):
    """Shared loop of generate_boxes / complete_scene: decode into slots
    [start, limit) until the end symbol is sampled."""

    def decode(b, k):
        return model.apply(variables, b, k,
                           method=AutoregressiveTransformer.decode_step)

    def cond_fn(carry):
        b, i, done, k = carry
        return jnp.logical_and(jnp.logical_not(done), i < limit)

    def body_fn(carry):
        b, i, done, k = carry
        k, sub = jax.random.split(k)
        box = decode(b, sub)
        out = dict(b)
        for name in ("class_labels", "translations", "sizes", "angles"):
            out[name] = jax.lax.dynamic_update_slice_in_dim(
                b[name], box[name].astype(b[name].dtype), i, axis=1)
        out["valid_mask"] = b["valid_mask"].at[:, i].set(1.0)
        # end-symbol check AFTER writing (the end box stays in the output,
        # reference generate_boxes:215-220)
        done = box["class_labels"][0, 0, -1] == 1
        return (out, i + 1, done, k)

    boxes, count, _, _ = jax.lax.while_loop(
        cond_fn, body_fn, (boxes, start, jnp.asarray(False), key))
    return boxes, count


def generate_boxes(model: AutoregressiveTransformer, variables, room_mask,
                   key: jax.Array, max_boxes: int = 32
                   ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Generate a full scene (reference ``generate_boxes``,
    ``autoregressive_transformer.py:209-227``).

    Returns ``(boxes, count)``: fixed-shape (1, max_boxes, ·) buffers whose
    first ``count`` slots are generated boxes (the last one being the end
    symbol unless ``max_boxes`` was exhausted), plus the matching
    ``valid_mask``.
    """
    boxes = _empty_boxes(room_mask.shape[0], max_boxes, model.n_classes,
                         model.contact)
    boxes["room_layout"] = room_mask
    return _autoregressive_fill(model, variables, boxes, key,
                                jnp.asarray(0, jnp.int32), max_boxes)


def complete_scene(model: AutoregressiveTransformer, variables,
                   boxes: Dict[str, jax.Array], room_mask, key: jax.Array,
                   max_boxes: int = 100
                   ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Autocomplete a partial scene (reference ``complete_scene``,
    ``autoregressive_transformer.py:303-334``): keeps the given boxes and
    appends up to ``max_boxes`` sampled ones."""
    B, L0, C = boxes["class_labels"].shape
    out = _empty_boxes(B, L0 + max_boxes, C, model.contact)
    for name in ("class_labels", "translations", "sizes", "angles",
                 "contact_labels"):
        if name in boxes:
            out[name] = jax.lax.dynamic_update_slice_in_dim(
                out[name], boxes[name].astype(jnp.float32), 0, axis=1)
    given = boxes.get("valid_mask", jnp.ones((B, L0)))
    out["valid_mask"] = out["valid_mask"].at[:, :L0].set(given)
    out["room_layout"] = room_mask
    return _autoregressive_fill(model, variables, out, key,
                                jnp.asarray(L0, jnp.int32), L0 + max_boxes)


def add_object(model: AutoregressiveTransformer, variables, room_mask,
               class_label, boxes: Dict[str, jax.Array], key: jax.Array
               ) -> Dict[str, jax.Array]:
    """Place one object of a requested class (reference ``add_object``,
    ``autoregressive_transformer.py:261-301``).  Returns the boxes with the
    sampled object and the end symbol appended."""
    cls = _as_class_onehot(class_label, model.n_classes)
    full = dict(boxes)
    full["room_layout"] = room_mask
    box = model.apply(variables, full, cls, key,
                      method=AutoregressiveTransformer.decode_step_with_class)
    end = end_symbol(model.n_classes)
    return {
        k: jnp.concatenate([boxes[k], box[k], end[k]], axis=1)
        for k in ("class_labels", "translations", "sizes", "angles")
    }


def add_object_with_class_and_translation(
    model: AutoregressiveTransformer, variables, room_mask, class_label,
    translation, boxes: Dict[str, jax.Array], key: jax.Array
) -> Dict[str, jax.Array]:
    """(reference ``add_object_with_class_and_translation``,
    ``autoregressive_transformer.py:368-417``)"""
    cls = _as_class_onehot(class_label, model.n_classes)
    tr = jnp.asarray(translation, jnp.float32).reshape(1, 1, 3)
    full = dict(boxes)
    full["room_layout"] = room_mask
    box = model.apply(
        variables, full, cls, tr, key,
        method=AutoregressiveTransformer.decode_step_with_class_and_translation)
    end = end_symbol(model.n_classes)
    return {
        k: jnp.concatenate([boxes[k], box[k], end[k]], axis=1)
        for k in ("class_labels", "translations", "sizes", "angles")
    }


def distribution_translations(model: AutoregressiveTransformer, variables,
                              boxes: Dict[str, jax.Array], room_mask,
                              class_label):
    """(reference ``distribution_translations``,
    ``autoregressive_transformer.py:433-468``)"""
    cls = _as_class_onehot(class_label, model.n_classes)
    full = dict(boxes)
    full["room_layout"] = room_mask
    return model.apply(
        variables, full, cls,
        method=AutoregressiveTransformer.distribution_translations)
