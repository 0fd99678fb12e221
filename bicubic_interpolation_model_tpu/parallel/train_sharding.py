"""Multi-chip training: the weight-predictor train step jit-compiled over a
(data x spatial) mesh.

Sharding layout (GSPMD inserts the collectives):
- batches [B, H, W, C]: B over the ``data`` axis (pure data parallelism),
  H over the ``spatial`` axis (conv halos exchanged automatically by XLA's
  spatial partitioner — the scaling path for frames too large per chip);
- params + optimizer state: replicated (the model is ~23k params — sharding
  them would be all cost, no benefit);
- loss/grads: psum'd across the mesh by jit from the replicated-output spec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_train_step(model, optimizer, mesh: Mesh,
                            data_axis: str = "data",
                            spatial_axis: str = "spatial"):
    """Returns (step, shard_batch) where step(params, opt_state, img, off, y,
    mask) runs one fused fwd+bwd+update with mesh-sharded batches."""
    batch_spec = P(data_axis, spatial_axis, None, None)
    batch_sharding = NamedSharding(mesh, batch_spec)
    repl = NamedSharding(mesh, P())

    def loss_fn(params, img, off, y, mask):
        pred = model.apply(params, img, off)
        err = (pred - y) * mask
        denom = jnp.maximum(mask.sum() * y.shape[-1], 1.0)
        return jnp.sum(err * err) / denom

    @jax.jit
    def step(params, opt_state, img, off, y, mask):
        img = jax.lax.with_sharding_constraint(img, batch_sharding)
        off = jax.lax.with_sharding_constraint(off, batch_sharding)
        y = jax.lax.with_sharding_constraint(y, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, img, off, y, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(*arrays):
        return tuple(jax.device_put(a, batch_sharding) for a in arrays)

    def replicate(tree):
        return jax.device_put(tree, repl)

    return step, shard_batch, replicate


def make_sharded_direct_step(model, optimizer, mesh: Mesh,
                             data_axis: str = "data",
                             spatial_axis: str = "spatial"):
    """Sharded train step for the direct pixel-regression SR family
    (ESPCN/ESRGANLite/SRResNetTPU): (lr, hr) batches sharded B over
    ``data`` and H over ``spatial`` (XLA's spatial partitioner exchanges
    the 3x3-conv halos), params/opt replicated, grads psum'd by GSPMD.
    Same layout rationale as :func:`make_sharded_train_step`; the largest
    family member (SRResNetTPU, ~1.9M params f32 = 7.6 MB) is still far
    cheaper replicated than gathered per step."""
    batch_sharding = NamedSharding(mesh, P(data_axis, spatial_axis,
                                           None, None))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, lr, hr):
        pred = model.apply(params, lr)
        return jnp.mean((pred - hr) ** 2)

    @jax.jit
    def step(params, opt_state, lr, hr):
        lr = jax.lax.with_sharding_constraint(lr, batch_sharding)
        hr = jax.lax.with_sharding_constraint(hr, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, lr, hr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(*arrays):
        return tuple(jax.device_put(a, batch_sharding) for a in arrays)

    def replicate(tree):
        return jax.device_put(tree, repl)

    return step, shard_batch, replicate
