"""Room-layout feature extractors: ResNet18 / AlexNet (flax, NHWC).

Faithful re-designs of the reference's torchvision-based extractors
(``atiss/scene_synthesis/networks/feature_extractors.py:27-93``) so released
ATISS/MIME checkpoints can be converted and evaluated:

  * :class:`ResNet18Features` — torchvision ``resnet18`` topology with the
    reference's surgery applied: ``conv1`` rebuilt for ``input_channels``
    (``feature_extractors.py:39-46``), ``fc`` replaced by
    ``Linear(512,512)+ReLU+Linear(512,feature_size)`` (:48-51), adaptive
    (1,1) average pooling (:52).
  * :class:`_BN` frozen mode — the reference's ``FrozenBatchNorm2d``
    (``frozen_batchnorm.py:14-76``): batch statistics are constants and the
    conversion-time quirk that ``bn.eps`` is folded INTO ``running_var``
    (``frozen_batchnorm.py:38``) while the forward pass applies a bare
    ``rsqrt`` (:72) is reproduced so converted checkpoints match bit-level.
  * :class:`AlexNetFeatures` — torchvision ``alexnet.features`` with the
    first conv rebuilt (:61-67) and a single ``Linear(9216,feature_size)``
    head on the flattened 6x6 adaptive pool (:69-76).

Layout: compute is NHWC (TPU-native); parameter names mirror the torch
state_dict paths (``layer1.0.conv1`` -> module ``layer1_0`` / ``conv1``) so
``train/checkpoint.py:convert_atiss_state_dict`` is a rename + kernel
transpose.  Inputs accept either NCHW (torch contract, (B, 1, 64, 64) room
masks) or NHWC; NCHW is detected by the 1/3-channel second axis and
transposed once on entry.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from lsdm_tpu.ops.attention import TorchLinear


def to_nhwc(x: jax.Array) -> jax.Array:
    """(B, C, H, W) torch layout -> (B, H, W, C); NHWC passes through."""
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def adaptive_avg_pool(x: jax.Array, out_hw: Sequence[int]) -> jax.Array:
    """torch ``AdaptiveAvgPool2d`` on NHWC with static shapes.

    Output bin ``i`` averages ``input[floor(i*H/oh) : ceil((i+1)*H/oh)]``
    (torch's kernel geometry) — exact for every H/W, including the upsampling
    case (1x1 -> 6x6) the reference's AlexNet head hits on 64x64 rooms.
    """
    B, H, W, C = x.shape
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return x
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -((-(i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -((-(j + 1) * W) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


class _BN(nn.Module):
    """BatchNorm2d over NHWC, frozen or live; flat param layout
    (params: scale/bias; batch_stats: mean/var) so the checkpoint converter's
    torch->flax rename is direct.

    Frozen (reference ``frozen_batchnorm.py:64-76``): ``scale = weight *
    rsqrt(running_var)`` with NO epsilon — ``from_batch_norm`` already folded
    ``bn.eps`` into ``running_var`` (:38), and the converter keeps the stats
    verbatim, so numerics match torch exactly.  Live: torch ``BatchNorm2d``
    semantics (eps 1e-5, momentum 0.1, biased batch var for normalization,
    unbiased for the running update).
    """

    features: int
    frozen: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features
        weight = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        # Initialized to torchvision fresh-BN values (mean 0; var 1, plus the
        # frozen-path eps fold per frozen_batchnorm.py:38); overwritten by the
        # checkpoint converter.
        init_var = 1.0 + 1e-5 if self.frozen else 1.0
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((f,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.full((f,), init_var, jnp.float32))
        if self.frozen:
            scale = weight * jax.lax.rsqrt(var.value)
        elif train:
            m = jnp.mean(x, axis=(0, 1, 2))
            v = jnp.mean(jnp.square(x - m), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if not self.is_initializing():
                mean.value = 0.9 * mean.value + 0.1 * m
                var.value = 0.9 * var.value + 0.1 * v * n / max(n - 1, 1)
            scale = weight * jax.lax.rsqrt(v + 1e-5)
            shift = bias - m * scale
            return (x.astype(self.dtype) * scale.astype(self.dtype)
                    + shift.astype(self.dtype))
        else:
            scale = weight * jax.lax.rsqrt(var.value + 1e-5)
        shift = bias - mean.value * scale
        return (x.astype(self.dtype) * scale.astype(self.dtype)
                + shift.astype(self.dtype))


class TorchConv(nn.Module):
    """Conv2d with torch-layout kernel storage (out, in, kh, kw).

    Keeping the torch layout makes checkpoint conversion a verbatim copy (the
    transpose to XLA's HWIO happens at trace time and is folded into the
    compiled program as a constant reshape).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (self.features, in_ch, kh, kw), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.transpose(kernel, (2, 3, 1, 0)).astype(self.dtype),  # HWIO
            window_strides=tuple(self.strides),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _max_pool_3x3s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(3, stride=2, padding=1)`` (padding never wins: -inf)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicBlock(nn.Module):
    """torchvision ``BasicBlock`` (two 3x3 convs + identity/downsample)."""

    features: int
    stride: int = 1
    downsample: bool = False
    frozen_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f, s = self.features, self.stride
        out = TorchConv(f, (3, 3), (s, s), (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        out = _BN(f, self.frozen_bn, self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = TorchConv(f, (3, 3), (1, 1), (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(out)
        out = _BN(f, self.frozen_bn, self.dtype, name="bn2")(out, train)
        if self.downsample:
            # torch Sequential(conv1x1, bn) -> indices 0/1
            x = TorchConv(f, (1, 1), (s, s), (0, 0), use_bias=False,
                          dtype=self.dtype, name="downsample_0")(x)
            x = _BN(f, self.frozen_bn, self.dtype, name="downsample_1")(x, train)
        return nn.relu(out + x)


class ResNet18Features(nn.Module):
    """(reference ``feature_extractors.py:27-52``)"""

    feature_size: int = 256
    freeze_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = to_nhwc(x).astype(self.dtype)
        x = TorchConv(64, (7, 7), (2, 2), (3, 3), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        x = _BN(64, self.freeze_bn, self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = _max_pool_3x3s2(x)
        widths = (64, 128, 256, 512)
        for li, w in enumerate(widths, start=1):
            stride = 1 if li == 1 else 2
            x = BasicBlock(w, stride, downsample=stride != 1,
                           frozen_bn=self.freeze_bn, dtype=self.dtype,
                           name=f"layer{li}_0")(x, train)
            x = BasicBlock(w, 1, downsample=False, frozen_bn=self.freeze_bn,
                           dtype=self.dtype, name=f"layer{li}_1")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        x = nn.relu(TorchLinear(512, dtype=self.dtype, name="fc_0")(x))
        return TorchLinear(self.feature_size, dtype=self.dtype, name="fc_2")(x)


class AlexNetFeatures(nn.Module):
    """(reference ``feature_extractors.py:55-76``)"""

    feature_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train  # no normalization layers
        x = to_nhwc(x).astype(self.dtype)
        # torchvision alexnet.features, Sequential indices preserved in names
        x = nn.relu(TorchConv(64, (11, 11), (4, 4), (2, 2), dtype=self.dtype,
                              name="features_0")(x))
        x = _max_pool_3x3s2_nopad(x)
        x = nn.relu(TorchConv(192, (5, 5), (1, 1), (2, 2), dtype=self.dtype,
                              name="features_3")(x))
        x = _max_pool_3x3s2_nopad(x)
        x = nn.relu(TorchConv(384, (3, 3), (1, 1), (1, 1), dtype=self.dtype,
                              name="features_6")(x))
        x = nn.relu(TorchConv(256, (3, 3), (1, 1), (1, 1), dtype=self.dtype,
                              name="features_8")(x))
        x = nn.relu(TorchConv(256, (3, 3), (1, 1), (1, 1), dtype=self.dtype,
                              name="features_10")(x))
        x = _max_pool_3x3s2_nopad(x)
        x = adaptive_avg_pool(x, (6, 6))
        # torch flattens NCHW (channel-major): transpose before reshape
        # (feature_extractors.py:74 ``X.view(X.shape[0], -1)``)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return TorchLinear(self.feature_size, dtype=self.dtype, name="fc")(x)


def _max_pool_3x3s2_nopad(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(3, stride=2)`` (no padding; AlexNet geometry)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
