"""SRGAN amplification-upsampling aux — flax re-design of
``/root/reference/hnet/srgan_pytorch.py:1-186`` (SRGAN generator with
pixel-shuffle upsampling, BN discriminator, WGAN variant + gradient penalty).

The reference uses it for super-resolving low-amplification pathology tiles
before feeding high-amplification headers.  TPU-first notes: pixel shuffle is
a pure reshape/transpose (free under XLA); the WGAN-GP per-sample gradient
is one ``jax.grad`` of the summed critic (each sample's output depends only
on its own input, so the summed gradient IS the per-sample gradient).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("alpha", lambda k: jnp.asarray(self.init, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def pixel_shuffle(x: Array, r: int) -> Array:
    """(B, H, W, C·r²) → (B, H·r, W·r, C) — torch PixelShuffle in NHWC."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    # torch layout is channel-major: input channel index = c·r² + i·r + j
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, C)


class SRResidualBlock(nn.Module):
    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = PReLU(name="prelu")(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        return x + y


class SRGenerator(nn.Module):
    """5-residual-block SRGAN generator; output in [0, 1]
    (srgan_pytorch.py:41-73)."""

    scale_factor: int = 2
    channels: int = 64
    num_blocks: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h1 = PReLU(name="prelu_in")(
            nn.Conv(self.channels, (9, 9), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        )
        h = h1
        for i in range(self.num_blocks):
            h = SRResidualBlock(self.channels, dtype=self.dtype, name=f"res{i}")(h, train)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_mid")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_mid")(h)
        h = h1 + h
        for j in range(int(math.log2(self.scale_factor))):
            h = nn.Conv(self.channels * 4, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up{j}_conv")(h)
            h = pixel_shuffle(h, 2)
            h = PReLU(name=f"up{j}_prelu")(h)
        out = nn.Conv(3, (9, 9), padding="SAME", dtype=self.dtype, name="conv_out")(h)
        return (jnp.tanh(out.astype(jnp.float32)) + 1.0) / 2.0


class SRDiscriminator(nn.Module):
    """Conv-ladder critic (srgan_pytorch.py:76-161).  ``wgan=True`` drops the
    BatchNorms and the output sigmoid (Discriminator_WGAN)."""

    wgan: bool = False
    leak: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        widths = [(64, 1), (64, 2), (128, 1), (128, 2),
                  (256, 1), (256, 2), (512, 1), (512, 2)]
        h = x
        for i, (c, s) in enumerate(widths):
            h = nn.Conv(c, (3, 3), strides=(s, s), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            if not self.wgan and i > 0:
                h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name=f"bn{i}")(h)
            h = nn.leaky_relu(h, self.leak)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        h = nn.leaky_relu(
            nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc1")(h), self.leak
        )
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="fc2")(h)
        out = h.reshape(x.shape[0]).astype(jnp.float32)
        return out if self.wgan else jax.nn.sigmoid(out)


def gradient_penalty(critic_fn, real: Array, fake: Array, rng) -> Array:
    """WGAN-GP (srgan_pytorch.py:164-186): penalty on the critic's gradient
    norm at random interpolates between real and fake samples.

    ``critic_fn(images) -> (B,)`` must already close over parameters (e.g.
    ``lambda x: disc.apply(vars, x)``).
    """
    B = real.shape[0]
    alpha = jax.random.normal(rng, (B, 1, 1, 1), real.dtype)  # randn, per ref
    inter = alpha * real + (1.0 - alpha) * fake
    grads = jax.grad(lambda z: jnp.sum(critic_fn(z)))(inter)
    norms = jnp.sqrt(jnp.sum(grads.reshape(B, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
