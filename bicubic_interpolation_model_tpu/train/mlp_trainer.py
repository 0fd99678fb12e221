"""Trainer for the v2.0-style per-pixel MLP: SGD, MSE, max-norm kernel
constraint after each step, early stopping with patience 5
(version2.0/utils/train.js:54-90, :124-149)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp_predictor import apply_max_norm


@dataclasses.dataclass
class MLPTrainConfig:
    learning_rate: float = 0.01
    epochs: int = 100
    batch_size: int = 8192
    max_norm: float = 3.0
    patience: int = 5          # early stopping (v2 train.js:124-149)
    min_delta: float = 1e-7
    seed: int = 0


def train_pixel_mlp(model, features: np.ndarray, targets: np.ndarray,
                    cfg: MLPTrainConfig | None = None, log=print):
    """features [N, F], targets [N, 16] → trained params (+ history)."""
    cfg = cfg or MLPTrainConfig()
    optimizer = optax.sgd(cfg.learning_rate)
    params = model.init(jax.random.key(cfg.seed), jnp.zeros((1, features.shape[1])))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply(p, x)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_max_norm(params, cfg.max_norm)
        return params, opt_state, loss

    rng = np.random.default_rng(cfg.seed)
    n = features.shape[0]
    if n == 0:
        raise ValueError("empty feature set")
    batch = min(cfg.batch_size, n)
    best = np.inf
    stale = 0
    history = []
    for epoch in range(cfg.epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = order[i:i + batch]
            params, opt_state, loss = step(params, opt_state,
                                           features[idx], targets[idx])
            losses.append(float(loss))
        avg = float(np.mean(losses)) if losses else np.inf
        history.append(avg)
        log(f"epoch {epoch + 1}: loss={avg:.8f}")
        if avg < best - cfg.min_delta:
            best = avg
            stale = 0
        else:
            stale += 1
            if stale >= cfg.patience:
                log(f"early stop at epoch {epoch + 1} (patience {cfg.patience})")
                break
    return params, history
