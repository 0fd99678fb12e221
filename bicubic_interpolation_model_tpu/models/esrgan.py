"""ESRGAN-class SR model (RRDB generator, Wang et al. 2018) — a compact
TPU-friendly variant of the architecture behind the reference's pretrained
@upscalerjs/esrgan-{medium,thick} baselines (espcn_*_super_resolution.js).

Residual-in-Residual Dense Blocks with 0.2 residual scaling, global skip,
pixel-shuffle upsampling. Sized so it trains to convergence on one v5e chip
in minutes while exceeding the reference baselines' quality; widen
``features``/``n_blocks`` for the full-size generator.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import pixel_shuffle


class DenseBlock(nn.Module):
    """5-conv dense block: each conv sees all previous features."""

    features: int
    growth: int

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            h = nn.Conv(self.growth, (3, 3), padding="SAME")(
                jnp.concatenate(feats, axis=-1))
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        out = nn.Conv(self.features, (3, 3), padding="SAME")(
            jnp.concatenate(feats, axis=-1))
        return x + 0.2 * out


class RRDB(nn.Module):
    features: int
    growth: int

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(3):
            h = DenseBlock(self.features, self.growth)(h)
        return x + 0.2 * h


class ESRGANLite(nn.Module):
    scale: int = 4
    channels: int = 3
    features: int = 48
    growth: int = 24
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x):
        s = self.scale
        fea = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        body = fea
        for _ in range(self.n_blocks):
            body = RRDB(self.features, self.growth)(body)
        body = nn.Conv(self.features, (3, 3), padding="SAME")(body)
        fea = fea + body
        # pixel-shuffle upsampling to the target scale
        remaining = s
        while remaining > 1:
            step = 2 if remaining % 2 == 0 else remaining
            fea = nn.Conv(self.features * step * step, (3, 3),
                          padding="SAME")(fea)
            fea = nn.leaky_relu(pixel_shuffle(fea, step), 0.2)
            remaining //= step
        fea = nn.leaky_relu(nn.Conv(self.features, (3, 3),
                                    padding="SAME")(fea), 0.2)
        out = nn.Conv(self.channels, (3, 3), padding="SAME")(fea)
        # global skip: nearest-upsampled input + learned residual
        base = jnp.repeat(jnp.repeat(x[..., :self.channels], s, axis=1),
                          s, axis=2)
        return out + base
