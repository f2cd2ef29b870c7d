"""Patch encoders: truncated ResNet (images) and feature projector.

Parity notes:
  * Conv encoder = torchvision-style ResNet-18/50 truncated after layer2
    (n_res_blocks=2) or layer4 (n_res_blocks=4), with the 7x7 stem conv
    rebuilt for ``n_chan_in`` channels, ending in global average pooling
    (reference architecture/ips_net.py:17-52).
  * Feature projector = LayerNorm(no affine) -> Linear -> BatchNorm -> ReLU
    (reference architecture/ips_net.py:54-60).

TPU-native: NHWC layout (XLA:TPU's native conv layout), BatchNorm with
torch semantics (momentum .1 == flax momentum .9, eps 1e-5), and a
configurable compute dtype (bf16 matmul/conv with fp32 batch statistics).
Pretrained ImageNet weights load from a local converted ``.npz`` (see
ips_tpu/models/pretrained.py) since the build environment has no network
egress; parity knob: reference ips_net.py:20-25.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ips_tpu.models.norm import MaskedBatchNorm

# torchvision's kaiming_normal_(mode='fan_out', nonlinearity='relu')
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class StemConv(nn.Module):
    """7x7/stride-2 stem conv with an optional space-to-depth formulation.

    The 1-channel stem is the encoder's least MXU-efficient op (measured
    8.5 TF/s on v5e: contraction depth 7*7*C_in is tiny). With
    ``s2d=True`` the SAME 7x7 parameter is zero-padded to 8x8 and
    re-indexed into a 4x4 conv over the 2x2-phase space-to-depth input —
    numerically identical output (tests/test_encoders.py), 4x the
    contraction depth, and checkpoints stay interchangeable because the
    stored kernel is unchanged. Requires even H and W (all shipped
    workloads: 50, 224, 1200/1600).
    """

    n_chan_in: int
    s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", _conv_init,
                            (7, 7, self.n_chan_in, 64))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        H, W = x.shape[1:3]
        if not self.s2d or H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=dn)
        C = self.n_chan_in
        n = x.shape[0]
        # pad 3 -> even (H+6, W+6); 2x2 phases to channels
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xs = xp.reshape(n, (H + 6) // 2, 2, (W + 6) // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, (H + 6) // 2, (W + 6) // 2, 4 * C)
        # kernel (7,7,C,64) -> zero-pad (8,8) -> (4,4,(p,q,c),64)
        k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        ks = k8.reshape(4, 2, 4, 2, C, 64).transpose(0, 2, 1, 3, 4, 5)
        ks = ks.reshape(4, 4, 4 * C, 64)
        dn2 = jax.lax.conv_dimension_numbers(xs.shape, ks.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xs, ks, window_strides=(1, 1), padding="VALID",
            dimension_numbers=dn2)


class BasicBlock(nn.Module):
    """ResNet-18/34 residual block (3x3 -> 3x3)."""

    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 row_weights=None) -> jax.Array:
        norm = lambda name, h: MaskedBatchNorm(name=name)(
            h, use_running_average=not train, weights=row_weights)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(norm("bn1", y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2", y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn", residual)
        return jax.nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """ResNet-50 residual block (1x1 -> 3x3 -> 1x1, expansion 4)."""

    width: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 row_weights=None) -> jax.Array:
        norm = lambda name, h: MaskedBatchNorm(name=name)(
            h, use_running_average=not train, weights=row_weights)
        out_ch = self.width * 4
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(norm("bn1", y))
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(norm("bn2", y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3", y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn", residual)
        return jax.nn.relu(y + residual)


_STAGE_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}


def encoder_out_dim(enc_type: str, n_res_blocks: int) -> int:
    """Feature dim after truncation (128/512 for r18, 512/2048 for r50)."""
    if enc_type == "resnet18":
        return 128 if n_res_blocks == 2 else 512
    return 512 if n_res_blocks == 2 else 2048


class ConvPatchEncoder(nn.Module):
    """Truncated ResNet over NHWC patches -> pooled feature vector."""

    enc_type: str = "resnet18"
    n_chan_in: int = 3
    n_res_blocks: int = 2      # 2 => stem+layer1+layer2; 4 => all stages
    s2d_stem: bool = False     # space-to-depth stem (exact, faster on TPU)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 row_weights=None) -> jax.Array:
        """x: (B, H, W, C) -> (B, D_out); row_weights (B,) masks padded
        rows out of the BatchNorm batch statistics."""
        blocks: Sequence[int] = _STAGE_BLOCKS[self.enc_type]
        is_bottleneck = self.enc_type == "resnet50"

        y = StemConv(n_chan_in=self.n_chan_in, s2d=self.s2d_stem,
                     dtype=self.dtype, name="conv1")(x)
        y = MaskedBatchNorm(name="bn1")(y, use_running_average=not train,
                                        weights=row_weights)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        n_stages = 2 if self.n_res_blocks == 2 else 4
        for stage in range(n_stages):
            width = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(blocks[stage]):
                name = f"layer{stage + 1}_block{b}"
                blk = (BottleneckBlock(width=width,
                                       stride=stride if b == 0 else 1,
                                       dtype=self.dtype, name=name)
                       if is_bottleneck else
                       BasicBlock(filters=width,
                                  stride=stride if b == 0 else 1,
                                  dtype=self.dtype, name=name))
                y = blk(y, train, row_weights)

        # Global average pool (reference appends nn.AdaptiveAvgPool2d(1)).
        return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)


class _LinearParams(nn.Module):
    """Registers kernel+bias with nn.Dense's exact param tree and init
    streams (same names, shapes, init args under this module's scope), so
    the folded projector below shares checkpoints with the nn.Dense path."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        from ips_tpu.models.transformer import torch_linear_init
        init = torch_linear_init(self.fan_in)
        kernel = self.param("kernel", init, (self.fan_in, self.features),
                            jnp.float32)
        bias = self.param("bias", init, (self.features,), jnp.float32)
        return kernel, bias


class FeatureProjector(nn.Module):
    """Projector for precomputed features: LN(no affine)->Dense->BN->ReLU.

    ln_fold: TPU-native formulation of the same map. LayerNorm's per-row
    affine commutes through the linear layer,

        ((x - m) * r) @ W + b  ==  r * (x @ W) - (r * m) * colsum(W) + b

    so the GEMM reads the RAW bf16 feature rows and the normalization
    becomes a row-affine on the (.., D) output — 2048/D x less elementwise
    traffic, and XLA stops materializing an fp32 upcast of the whole
    (B, N, n_chan_in) table (measured: the upcast fusion alone was
    4.0 ms/step at camelyon scale, results/camelyon_op_breakdown_auto2.json).
    The GEMM accumulates in fp32 (preferred_element_type) and the affine is
    applied in fp32, so the fold loses no precision to the cancellation of
    the mean term; numerics differ from the exact path only at bf16
    rounding scale (the exact path rounds the normalized rows to bf16
    before the GEMM, the fold rounds nothing — selection fidelity measured
    in RESULTS.md). Param tree and init values are identical either way.
    """

    n_chan_in: int
    D: int
    dtype: jnp.dtype = jnp.float32
    ln_fold: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 row_weights=None) -> jax.Array:
        """x: (B, n_chan_in) -> (B, D)."""
        # torch Linear default init (with bias) — see transformer.torch_linear_init
        from ips_tpu.models.transformer import torch_linear_init
        lin_init = torch_linear_init(self.n_chan_in)
        if not self.ln_fold:
            y = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                             name="ln")(x)
            y = nn.Dense(self.D, kernel_init=lin_init, bias_init=lin_init,
                         dtype=self.dtype, name="fc")(y)
        else:
            kernel, bias = _LinearParams(fan_in=self.n_chan_in,
                                         features=self.D, name="fc")()
            xf = x.astype(jnp.float32)
            # flax LayerNorm's fast-variance stats, replicated exactly
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            mu2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mu2 - jnp.square(mu))
            r = jax.lax.rsqrt(var + 1e-5)
            kb = kernel.astype(self.dtype)
            z = jax.lax.dot_general(
                x.astype(self.dtype), kb,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            colsum = jnp.sum(kb.astype(jnp.float32), axis=0)
            y = (z * r - (r * mu) * colsum + bias).astype(self.dtype)
        y = MaskedBatchNorm(name="bn")(y, use_running_average=not train,
                                       weights=row_weights)
        return jax.nn.relu(y).astype(jnp.float32)
