"""Data-parallel batch resize over a device mesh — the multi-chip serving
path (BASELINE config #5: video-stream batches sharded across a v5e pod).

Each device runs the fused Pallas kernel on its shard of the batch
(shard_map → zero cross-device traffic; images are independent), so
throughput scales linearly with mesh size. Pair with
parallel.spatial.resize_spatial_sharded when a *single* frame is too large
per chip instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit,
                   static_argnames=("scale", "method", "a", "mesh", "axis"))
def _resize_batch_sharded(imgs, scale, method, a, mesh, axis):
    from ..ops.pallas_phase import resize_phase_pallas

    def body(shard):
        return resize_phase_pallas(shard, scale, method, a=a)

    return shard_map(
        body, mesh=mesh,
        in_specs=P(axis, None, None, None),
        out_specs=P(axis, None, None, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(imgs)


def resize_batch_sharded(imgs, scale, method: str = "bicubic", *,
                         mesh: Mesh, axis: str = "data", a: float = -0.5):
    """[B, H, W, C] batch sharded over ``mesh[axis]``; B must divide evenly.

    Returns the upscaled batch with the same sharding (stays distributed for
    downstream per-shard work; gather it only if the host needs it).
    """
    imgs = jnp.asarray(imgs)
    n = mesh.shape[axis]
    if imgs.shape[0] % n:
        raise ValueError(f"batch {imgs.shape[0]} not divisible by {n} shards")
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("sharded batch resize requires an integer upscale")
    imgs = jax.device_put(imgs, NamedSharding(mesh, P(axis, None, None, None)))
    return _resize_batch_sharded(imgs, int(scale), method, float(a),
                                 mesh, axis)
