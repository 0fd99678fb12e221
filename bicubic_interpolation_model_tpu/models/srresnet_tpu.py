"""MXU-shaped SR generator — the framework's TPU-native flagship for the
reference's "best quality" ESRGAN slots (version3.0/utils/
espcn_thick_super_resolution.js loads @upscalerjs/esrgan-thick).

Design rationale (docs/PERF_NOTES.md, round 3c/3d): honest chained-K conv
timings on-chip show 3x3 convs at 24-48 output channels run at 6-13 TF/s
while 128-channel convs run at 59-66 TF/s — output channels occupy MXU
*lanes*, so anything under 128 wastes the systolic array proportionally.
ESRGAN's dense blocks (growth 24-48) and its HR-resolution tail convs
(~19 ms each at 1392x2040) are therefore architecturally slow on TPU no
matter how the compiler lowers them. This model keeps every conv at
128 features (full lanes) and LR resolution (EDSR-style residual body,
Lim et al. 2017), with a single depth-to-space at the very end (ESPCN
tail, Shi et al. 2016) — no conv ever sees an HR grid.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import pixel_shuffle


class SRResNetTPU(nn.Module):
    """EDSR-style body sized to the MXU: ``features`` defaults to 128 so
    conv output channels fill all 128 systolic-array lanes; the tail emits
    C*s^2 channels at LR and pixel-shuffles once (no HR-resolution convs).

    Global skip: nearest-upsampled input + learned residual, as in the
    ESPCNResidual/ESRGANLite family, so the net trains on residual detail.
    """

    scale: int = 4
    channels: int = 3
    features: int = 128
    n_blocks: int = 6
    res_scale: float = 0.2

    @nn.compact
    def __call__(self, x):
        s = self.scale
        h = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        skip = h
        for _ in range(self.n_blocks):
            r = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(h))
            r = nn.Conv(self.features, (3, 3), padding="SAME")(r)
            h = h + self.res_scale * r
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h) + skip
        h = nn.Conv(self.channels * s * s, (3, 3), padding="SAME")(h)
        up = pixel_shuffle(h, s)
        base = jnp.repeat(jnp.repeat(x[..., :self.channels], s, axis=1),
                          s, axis=2)
        return up + base
