"""ESPCN-class neural SR baselines — the framework's replacement for the
reference's third-party pretrained UpscalerJS ESRGAN models
(version3.0/utils/espcn_medium_super_resolution.js /
espcn_thick_super_resolution.js, which load @upscalerjs/esrgan-{medium,thick}).

The reference misnames ESRGAN models "espcn"; we provide actual ESPCN
(sub-pixel conv, Shi et al. 2016) in two sizes filling the medium/thick slots,
plus a residual "thick" variant with more body convs. All are
fully-convolutional ×S with pixel-shuffle output — MXU-friendly (every op is
a conv) and trainable on DIV2K with the built-in trainer.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import pixel_shuffle


class ESPCN(nn.Module):
    """conv5x5 -> conv3x3 -> conv3x3(C*s^2) -> depth-to-space."""

    scale: int = 4
    channels: int = 3
    features: int = 64

    @nn.compact
    def __call__(self, x):
        s = self.scale
        h = nn.relu(nn.Conv(self.features, (5, 5), padding="SAME")(x))
        h = nn.relu(nn.Conv(self.features // 2, (3, 3), padding="SAME")(h))
        h = nn.Conv(self.channels * s * s, (3, 3), padding="SAME")(h)
        return pixel_shuffle(h, s)


class ESPCNResidual(nn.Module):
    """'Thick' variant: deeper residual body + global bicubic-style skip via
    nearest-upsampled input, so the net learns the residual detail."""

    scale: int = 4
    channels: int = 3
    features: int = 64
    n_blocks: int = 6

    @nn.compact
    def __call__(self, x):
        s = self.scale
        h = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        skip = h
        for _ in range(self.n_blocks):
            r = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(h))
            r = nn.Conv(self.features, (3, 3), padding="SAME")(r)
            h = h + 0.1 * r
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h) + skip
        h = nn.Conv(self.channels * s * s, (3, 3), padding="SAME")(h)
        up = pixel_shuffle(h, s)
        base = jnp.repeat(jnp.repeat(x[..., :self.channels], s, axis=1), s, axis=2)
        return up + base


def _esrgan_lite(scale=4):
    from .esrgan import ESRGANLite
    # dims of the shipping model/esrgan_lite checkpoint
    return ESRGANLite(scale=scale, features=64, growth=32, n_blocks=6)


def _esrgan_plus(scale=4):
    from .esrgan import ESRGANLite
    # dims of the shipping model/esrgan_plus checkpoint (round 2: a wider/
    # deeper generator for the top quality row)
    return ESRGANLite(scale=scale, features=96, growth=48, n_blocks=8)


def _srresnet_tpu(scale=4):
    from .srresnet_tpu import SRResNetTPU
    # the MXU-shaped flagship: 128-lane convs, LR-resolution-only body
    return SRResNetTPU(scale=scale, features=128, n_blocks=6)


MODEL_ZOO = {
    "espcn_medium": lambda scale=4: ESPCN(scale=scale),
    "espcn_thick": lambda scale=4: ESPCNResidual(scale=scale),
    "esrgan_lite": _esrgan_lite,
    "esrgan_plus": _esrgan_plus,
    "srresnet_tpu": _srresnet_tpu,
}
