"""RangeNet++ (darknet53 backbone) semantic segmentation in Flax.

TPU-native replacement for the vendored TensorRT inference library
(reference src/segnet/: `NetTensorRT::infer` netTensorRT.cpp:309-440 runs a
darknet53 ONNX engine on a 64x2048x5 spherical range image). Here the same
architecture is a Flax module compiled by XLA: bf16 matmul/conv compute,
f32 params, fused into the SLAM step when semantics are enabled.

Architecture (faithful to rangenet_lib's darknet53 backbone-OS32
configuration, arch_cfg.yaml of the released model):
 - stem 3x3 conv (32),
 - 5 stages of [downsample conv + N residual blocks], N = 1,2,8,8,4,
   downsampling ONLY along the width axis (stride (1,2)) because the input
   is 64 rows tall,
 - decoder: 5 up-conv stages (width transposed conv) with skip additions,
 - 1x1 head -> num_classes logits.

The spherical projection (doProjection, netTensorRT.cpp:143-300) reuses the
SLAM front-end's range image; per-channel normalization means/stds come from
SemanticConfig (net.cpp:89-117).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SemanticConfig


class ConvBnLeaky(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-4,
            dtype=jnp.float32,
        )(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class ResidualBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnLeaky(self.features // 2, kernel=(1, 1), dtype=self.dtype)(
            x, train)
        y = ConvBnLeaky(self.features, kernel=(3, 3), dtype=self.dtype)(y, train)
        return x + y


class Darknet53Encoder(nn.Module):
    """OS-32 encoder, width-only strides."""

    blocks: Sequence[int] = (1, 2, 8, 8, 4)
    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnLeaky(32, dtype=self.dtype)(x, train)
        skips = []
        for n_blocks, width in zip(self.blocks, self.widths):
            skips.append(x)
            x = ConvBnLeaky(width, strides=(1, 2), dtype=self.dtype)(x, train)
            for _ in range(n_blocks):
                x = ResidualBlock(width, dtype=self.dtype)(x, train)
        return x, skips


class UpBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.ConvTranspose(
            self.features, (1, 4), strides=(1, 2), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-4,
            dtype=jnp.float32,
        )(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = ConvBnLeaky(self.features, dtype=self.dtype)(x, train)
        if skip.shape[-1] != x.shape[-1]:
            skip = nn.Conv(self.features, (1, 1), use_bias=False,
                           dtype=self.dtype)(skip)
        return x + skip


class RangeNet(nn.Module):
    """Full encoder-decoder; input (B, 64, W, 5), output (B, 64, W, C).

    blocks/widths default to the released darknet53 OS-32 configuration;
    the slim preset (config.slim_semantic_config) shrinks them for the
    in-repo synthetic checkpoint."""

    num_classes: int = 20
    dtype: jnp.dtype = jnp.bfloat16
    enc_blocks: Sequence[int] = (1, 2, 8, 8, 4)
    enc_widths: Sequence[int] = (64, 128, 256, 512, 1024)
    dec_widths: Sequence[int] = (512, 256, 128, 64, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        enc, skips = Darknet53Encoder(
            blocks=tuple(self.enc_blocks), widths=tuple(self.enc_widths),
            dtype=self.dtype,
        )(x, train)
        y = enc
        for feats, skip in zip(self.dec_widths, reversed(skips)):
            y = UpBlock(feats, dtype=self.dtype)(y, skip, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(y)
        return logits


def normalize_input(img: jnp.ndarray, cfg: SemanticConfig) -> jnp.ndarray:
    """Per-channel (x - mean) / std (netTensorRT.cpp:339-354), with the
    no-return mask zeroing (invalid pixels are zeroed after normalization)."""
    means = jnp.asarray(cfg.img_means, jnp.float32)
    stds = jnp.asarray(cfg.img_stds, jnp.float32)
    return (img - means) / stds


def build_input_image(rng_img, xyz_img, intensity_img, mask, cfg: SemanticConfig):
    """(range, x, y, z, intensity) channels from the projected scan
    (doProjection output layout, netTensorRT.cpp:143-300)."""
    img = jnp.concatenate(
        [rng_img[..., None], xyz_img, intensity_img[..., None]], axis=-1
    )
    img = normalize_input(img, cfg)
    return jnp.where(mask[..., None], img, 0.0)


def create_model(cfg: SemanticConfig):
    return RangeNet(num_classes=cfg.num_classes,
                    dtype=jnp.bfloat16 if cfg.fp16 else jnp.float32,
                    enc_blocks=cfg.enc_blocks, enc_widths=cfg.enc_widths,
                    dec_widths=cfg.dec_widths)


def init_params(key, cfg: SemanticConfig, input_w: int | None = None):
    model = create_model(cfg)
    w = input_w or cfg.model_input_w
    w = ((w + 31) // 32) * 32  # OS-32 encoder needs width % 32 == 0
    dummy = jnp.zeros((1, cfg.model_input_h, w, cfg.model_input_c))
    variables = model.init(key, dummy, train=False)
    return model, variables
