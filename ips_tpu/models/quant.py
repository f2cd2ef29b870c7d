"""int8-quantized selection encoder (opt-in, `select_dtype: int8`).

Selection is a no-grad, eval-mode *scoring* pass (reference
architecture/ips_net.py:168-169,190-193): its embeddings only rank
patches and are thrown away — the M survivors are re-encoded in full
precision for the gradient step (reference ips_net.py:264-283). That
makes selection the one place reduced-precision arithmetic is safe to
offer: v5e's int8 MXU path peaks at ~2x bf16 (measured ~1.9x on the
exact layer1 GEMM shape, scripts/probe_int8.py), and ranking fidelity
is measurable (selection-set Jaccard vs the full-precision scan,
tests/test_quant.py; RESULTS.md).

Scheme (standard post-training dynamic quantization):
  * weights: symmetric per-output-channel int8, computed in-jit from the
    SAME fp32 params the full-precision path uses (no separate
    checkpoint, always in sync with training);
  * activations: symmetric per-tensor dynamic int8 (scale from the
    running max(|x|) of each tensor);
  * conv/GEMM accumulate in int32, dequantize to fp32, then the folded
    eval-mode BatchNorm (scale+shift from running stats), ReLU, and
    residual adds run in fp32 exactly like the reference's eval pass.

The module consumes the unmodified flax param/batch_stats pytrees of
ConvPatchEncoder (ips_tpu/models/encoders.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ips_tpu.models.encoders import _STAGE_BLOCKS
from ips_tpu.models.norm import MaskedBatchNorm

_EPS = MaskedBatchNorm.epsilon    # folded BN must match the real encoder's
_QMAX = 127.0


def _fold_bn(bn_params: Dict, bn_stats: Dict):
    """Eval-mode BN -> per-channel (scale, shift): y = x*scale + shift."""
    inv = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + _EPS)
    shift = bn_params["bias"] - bn_stats["mean"] * inv
    return inv, shift


def _quant_act(x: jax.Array):
    """Symmetric per-tensor dynamic int8 quantization."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / _QMAX
    q = jnp.clip(jnp.round(x / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def _quant_kernel(k: jax.Array):
    """Symmetric per-output-channel int8 (HWIO: channel axis -1)."""
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8) / _QMAX
    q = jnp.clip(jnp.round(k / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def _qconv(x: jax.Array, kernel: jax.Array, *, stride=1, padding=1,
           bn=None, relu=False) -> jax.Array:
    """int8 conv with int32 accumulation, fp32 dequant + folded BN."""
    xq, s_x = _quant_act(x)
    kq, s_k = _quant_kernel(kernel.astype(jnp.float32))
    dn = jax.lax.conv_dimension_numbers(xq.shape, kq.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kq, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_k)
    if bn is not None:
        scale, shift = bn
        y = y * scale + shift
    return jax.nn.relu(y) if relu else y


def _basic_block(x, p, s, stride):
    y = _qconv(x, p["conv1"]["kernel"], stride=stride,
               bn=_fold_bn(p["bn1"], s["bn1"]), relu=True)
    y = _qconv(y, p["conv2"]["kernel"],
               bn=_fold_bn(p["bn2"], s["bn2"]))
    if "downsample_conv" in p:
        res = _qconv(x, p["downsample_conv"]["kernel"], stride=stride,
                     padding=0,
                     bn=_fold_bn(p["downsample_bn"], s["downsample_bn"]))
    else:
        res = x
    return jax.nn.relu(y + res)


def _bottleneck_block(x, p, s, stride):
    y = _qconv(x, p["conv1"]["kernel"], padding=0,
               bn=_fold_bn(p["bn1"], s["bn1"]), relu=True)
    y = _qconv(y, p["conv2"]["kernel"], stride=stride,
               bn=_fold_bn(p["bn2"], s["bn2"]), relu=True)
    y = _qconv(y, p["conv3"]["kernel"], padding=0,
               bn=_fold_bn(p["bn3"], s["bn3"]))
    if "downsample_conv" in p:
        res = _qconv(x, p["downsample_conv"]["kernel"], stride=stride,
                     padding=0,
                     bn=_fold_bn(p["downsample_bn"], s["downsample_bn"]))
    else:
        res = x
    return jax.nn.relu(y + res)




def quant_encode_patches(enc_params: Dict, enc_stats: Dict, x: jax.Array,
                         *, enc_type: str = "resnet18",
                         n_res_blocks: int = 2,
                         input_norm: str = "none") -> jax.Array:
    """(n, H, W, C) patches -> (n, D) embeddings, int8 conv arithmetic.

    Mirrors ConvPatchEncoder.__call__ in eval mode (encoders.py:162-193):
    stem conv 7x7/2 + BN + ReLU + maxpool, then the truncated stages,
    then global average pooling.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x.astype(jnp.float32)
    if input_norm == "imagenet":
        from ips_tpu.utils.imagenet import IMAGENET_MEAN, IMAGENET_STD
        x = (x - IMAGENET_MEAN) / IMAGENET_STD

    y = _qconv(x, enc_params["conv1"]["kernel"], stride=2, padding=3,
               bn=_fold_bn(enc_params["bn1"], enc_stats["bn1"]), relu=True)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))

    blocks = _STAGE_BLOCKS[enc_type]
    block_fn = _bottleneck_block if enc_type == "resnet50" else _basic_block
    n_stages = 2 if n_res_blocks == 2 else 4
    for stage in range(n_stages):
        stride = 1 if stage == 0 else 2
        for b in range(blocks[stage]):
            name = f"layer{stage + 1}_block{b}"
            y = block_fn(y, enc_params[name], enc_stats[name],
                         stride if b == 0 else 1)
    return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)


def make_quant_encode_fn(params: Dict, batch_stats: Dict, conf):
    """Selection encode closure (B, n, ...) -> (B, n, D) using int8 convs.

    Consumes the full model variables; drop-in for the selection path of
    IPSTrainer._enc_score_fns when conf.select_dtype == 'int8'.
    """
    enc_p = params["encoder"]
    enc_s = batch_stats["encoder"]

    def encode(x):
        lead = x.shape[:2]
        flat = x.reshape((lead[0] * lead[1],) + x.shape[2:])
        emb = quant_encode_patches(enc_p, enc_s, flat,
                                   enc_type=conf.enc_type,
                                   n_res_blocks=conf.n_res_blocks,
                                   input_norm=conf.input_norm)
        return emb.reshape(lead + (emb.shape[-1],))

    return encode
