"""Shared model layers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PixelShuffleUpsample(nn.Module):
    """Stride-S transposed conv with kernel size S — i.e. each input pixel
    emits an SxS block: out[sY+a, sX+b, o] = sum_i K[a,b,o,i] x[Y,X,i] + bias.

    Because stride == kernel size the blocks never overlap, so this is an
    einsum + reshape (pixel shuffle), which XLA maps onto the MXU as a plain
    matmul — no conv_transpose scatter. Parameter layout [S, S, out, in]
    matches TFJS Conv2DTranspose storage ([kh, kw, out_ch, in_ch]) so the
    reference checkpoints load without transposition
    (train.js:93-101; manifest conv2d_transpose_Conv2DTranspose1 [4,4,16,32]).
    """

    features: int
    scale: int

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        s = self.scale
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (s, s, self.features, in_feat))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("byxi,pqoi->bypxqo", x, kernel,
                       preferred_element_type=jnp.float32)
        b, h, _, w, _, o = y.shape
        return y.reshape(b, h * s, w * s, o) + bias


def pixel_shuffle(x, scale: int):
    """[B, H, W, C*s*s] -> [B, H*s, W*s, C] (depth-to-space)."""
    b, h, w, c = x.shape
    s = scale
    cout = c // (s * s)
    y = x.reshape(b, h, w, s, s, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, cout)
