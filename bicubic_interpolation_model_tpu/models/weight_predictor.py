"""The weight-predictor model: a fully-convolutional net that maps an LR
image + HR-resolution subpixel-offset map to 16 bicubic weights per HR pixel.

Topology matches the reference exactly (train.js buildDynamicModel:68-138 and
the checked-in model/<run>/model.json graphs) so the six reference TFJS
checkpoints import 1:1:

  img [B,H,W,4] ── Conv 32 3x3 relu ── Conv 32 3x3 ──(+residual)──
      PixelShuffleUpsample 16 (=Conv2DTranspose k4 s4 'same') ──
      x · sigmoid(Conv 1 1x1)  (attention) ──┐
  off [B,4H,4W,2] ── Conv 16 1x1 ────────────┴─ concat ── Conv 16 3x3 tanh

Output: [B, 4H, 4W, 16] predicted weights (tanh range covers the GT weight
range [-0.75, 1]).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import PixelShuffleUpsample


class WeightPredictor(nn.Module):
    features: int = 32
    n_weights: int = 16
    scale: int = 4

    @nn.compact
    def __call__(self, img, offsets):
        x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                            name="conv_in")(img))
        res = nn.Conv(self.features, (3, 3), padding="SAME",
                      name="conv_res")(x)
        x = x + res
        up = PixelShuffleUpsample(self.n_weights, self.scale, name="upsample")(x)
        att = nn.sigmoid(nn.Conv(1, (1, 1), padding="SAME",
                                 name="conv_att")(up))
        attended = up * att
        off = nn.Conv(self.n_weights, (1, 1), padding="SAME",
                      name="conv_off")(offsets)
        merged = jnp.concatenate([attended, off], axis=-1)
        out = nn.Conv(self.n_weights, (3, 3), padding="SAME",
                      name="conv_out")(merged)
        return nn.tanh(out)


def init_params(rng, scale: int = 4, h: int = 8, w: int = 8):
    model = WeightPredictor(scale=scale)
    img = jnp.zeros((1, h, w, 4), jnp.float32)
    off = jnp.zeros((1, h * scale, w * scale, 2), jnp.float32)
    return model, model.init(rng, img, off)
