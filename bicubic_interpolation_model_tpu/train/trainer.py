"""Training loop for the weight-predictor (and direct-SR baselines).

The reference trains with adam(1e-4), MSE loss on the 16-channel weight map,
MAE metric, batch = one whole image, 100 epochs (train.js:140-240). Here the
step is one jit-compiled fused fwd+bwd+adam update; two batching modes:

- ``patch`` (default): fixed-size random LR crops batched together — static
  shapes, one compilation, full MXU utilization. The TPU-native choice.
- ``image``: whole-image batches like the reference; images are padded to a
  size bucket (multiple of ``bucket``) with a loss mask so jit recompiles
  once per bucket instead of once per unique size.

Loss masking keeps padded pixels out of both the loss and the metrics.
"""

from __future__ import annotations

import dataclasses
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    epochs: int = 100
    mode: str = "patch"          # "patch" | "image"
    patch_lr: int = 64           # LR patch side (HR side = patch_lr * scale)
    batch_size: int = 8
    bucket: int = 64             # LR bucket multiple for image mode
    # image mode: batch up to this many SAME-BUCKET images per step. 1 (the
    # default) reproduces the reference's per-image Adam updates exactly
    # (train.js:174-207); >1 changes update granularity (batch-mean gradient
    # over the group) but fills the MXU — ~3x better per-pixel step time at
    # DIV2K sizes (PERF_NOTES round 3e).
    image_batch: int = 1
    scale: int = 4
    seed: int = 0
    log_every: int = 10
    adaptive_targets: bool = False  # v4.0-style luma-modulated GT weights
    # rematerialize the forward in the backward pass (jax.checkpoint):
    # whole-image batches at DIV2K geometry keep ~1 GB of SR-resolution
    # activations per image alive for the backward — image_batch=4 at the
    # 384x512 bucket exceeds one chip's 15.75 GB HBM without this
    remat: bool = False


def make_weight_predictor_step(model, optimizer, *, adaptive: bool = False,
                               scale: int = 4, remat: bool = False):
    """Step for (img, off, y_true) → weight-map MSE (+ MAE metric).

    With ``adaptive`` the GT target is modulated *on device inside the step*
    by the per-tap luma-contrast factors of v4.0 (ops.adaptive
    .adaptive_gt_factors) — the image-dependent analog of the reference's
    version4.0 data generator, with no precomputed Y tensors at all. The
    standard (normalized) base tile works as ``y``: per-pixel normalization
    is scale-invariant, so normalize(normalize(g)*f) == normalize(g*f),
    matching v4's base-then-renormalize exactly."""

    def targets(img, y):
        if not adaptive:
            return y
        from ..ops.adaptive import adaptive_gt_factors
        factors = jax.vmap(lambda im: adaptive_gt_factors(im, scale))(img)
        w = y * factors
        s = w.sum(axis=-1, keepdims=True)
        return jnp.where(s > 0, w / s, 0.0)

    apply = (jax.checkpoint(model.apply, static_argnums=())
             if remat else model.apply)

    def loss_fn(params, img, off, y, mask):
        pred = apply(params, img, off)
        err = (pred - targets(img, y)) * mask
        denom = jnp.maximum(mask.sum() * y.shape[-1], 1.0)
        mse = jnp.sum(err * err) / denom
        mae = jnp.sum(jnp.abs(err)) / denom
        return mse, mae

    @jax.jit
    def step(params, opt_state, img, off, y, mask):
        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img, off, y, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mae

    return step


def make_direct_sr_step(model, optimizer):
    """Step for (lr, hr) pixel-regression models (ESPCN family)."""

    def loss_fn(params, lr, hr):
        pred = model.apply(params, lr)
        err = pred - hr
        mse = jnp.mean(err * err)
        return mse, jnp.mean(jnp.abs(err))

    @jax.jit
    def step(params, opt_state, lr, hr):
        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lr, hr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mae

    return step


def _pad_to(arr, h, w):
    ph, pw = h - arr.shape[0], w - arr.shape[1]
    return np.pad(arr, ((0, ph), (0, pw), (0, 0)))


def _bucket(n, m):
    return -(-n // m) * m


class WeightPredictorTrainer:
    """Drives training over a dataset of (X, offset, Y) triplets keyed by id
    (the in-memory map produced by data.binfmt.load_dataset_dir)."""

    def __init__(self, model, config: TrainConfig | None = None):
        self.model = model
        self.cfg = config or TrainConfig()
        self.optimizer = optax.adam(self.cfg.learning_rate)
        self.step_fn = make_weight_predictor_step(
            self.model, self.optimizer,
            adaptive=self.cfg.adaptive_targets, scale=self.cfg.scale,
            remat=self.cfg.remat)
        self.history: list[dict] = []

    def init_params(self, rng_key=None):
        rng_key = rng_key if rng_key is not None else jax.random.key(self.cfg.seed)
        s = self.cfg.scale
        img = jnp.zeros((1, 8, 8, 4), jnp.float32)
        off = jnp.zeros((1, 8 * s, 8 * s, 2), jnp.float32)
        return self.model.init(rng_key, img, off)

    # ---- batch construction -------------------------------------------------

    def _patch_batches(self, data, rng):
        cfg = self.cfg
        s = cfg.scale
        p = cfg.patch_lr
        ids = [k for k, v in data.items() if v["X"].shape[0] >= p
               and v["X"].shape[1] >= p]
        if not ids:
            raise ValueError(f"no sample is >= {p}x{p} LR pixels")
        # stored-target datasets only; Y-less datasets route through
        # _synth_patch_batches (see fit()).
        for _ in range(max(1, len(ids))):
            imgs, offs, ys = [], [], []
            for _ in range(cfg.batch_size):
                d = data[ids[rng.integers(len(ids))]]
                h, w = d["X"].shape[:2]
                y0 = int(rng.integers(h - p + 1))
                x0 = int(rng.integers(w - p + 1))
                imgs.append(d["X"][y0:y0 + p, x0:x0 + p])
                offs.append(d["offset"][y0 * s:(y0 + p) * s,
                                        x0 * s:(x0 + p) * s])
                ys.append(d["Y"][y0 * s:(y0 + p) * s, x0 * s:(x0 + p) * s])
            mask = np.ones((cfg.batch_size, p * s, p * s, 1), np.float32)
            yield (np.stack(imgs), np.stack(offs), np.stack(ys), mask)

    def _image_batches(self, data):
        cfg = self.cfg
        s = cfg.scale
        nb = max(1, cfg.image_batch)

        # Y-less datasets (data.onthefly.load_hr_dir): both target maps are
        # S-periodic in each axis (dx depends only on x mod S; the GT Keys
        # weights only on the subpixel offset — data_generator.js:125-179),
        # so one synthesized map per PADDED bucket geometry is exact for
        # every image in the bucket (pad regions are masked out of the
        # loss; adaptive modulation happens inside the step from the image)
        synth_cache: dict[tuple[int, int], tuple] = {}

        def targets(d, hb, wb):
            if "offset" in d and "Y" in d:
                return (_pad_to(d["offset"], hb * s, wb * s),
                        _pad_to(d["Y"], hb * s, wb * s))
            key = (hb, wb)
            if key not in synth_cache:
                from ..ops.learned import gt_weight_map, offset_map
                off = np.asarray(offset_map(hb * s, wb * s, float(s),
                                            "train"))
                y = np.asarray(gt_weight_map(hb * s, wb * s, float(s)))
                synth_cache[key] = (off, y)
            return synth_cache[key]

        if nb == 1:
            # one image per step: keep insertion order so per-image Adam
            # updates land in the same sequence as the reference's loop
            # (reference train.js:174-207); bucketing would reorder them
            # and change the training trajectory.
            for sid, d in data.items():
                h, w = d["X"].shape[:2]
                hb, wb = _bucket(h, cfg.bucket), _bucket(w, cfg.bucket)
                m = np.zeros((hb * s, wb * s, 1), np.float32)
                m[:h * s, :w * s] = 1.0
                off, y = targets(d, hb, wb)
                yield (_pad_to(d["X"], hb, wb)[None], off[None], y[None],
                       m[None])
            return
        # group by bucketed LR shape so grouped images share one padded
        # geometry (and therefore one compiled program)
        groups: dict[tuple[int, int], list] = {}
        order: list[tuple[int, int]] = []
        for sid, d in data.items():
            h, w = d["X"].shape[:2]
            key = (_bucket(h, cfg.bucket), _bucket(w, cfg.bucket))
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(d)
        for key in order:
            hb, wb = key
            members = groups[key]
            for i in range(0, len(members), nb):
                chunk = members[i:i + nb]
                imgs, offs, ys, masks = [], [], [], []
                for d in chunk:
                    h, w = d["X"].shape[:2]
                    imgs.append(_pad_to(d["X"], hb, wb))
                    off, y = targets(d, hb, wb)
                    offs.append(off)
                    ys.append(y)
                    m = np.zeros((hb * s, wb * s, 1), np.float32)
                    m[:h * s, :w * s] = 1.0
                    masks.append(m)
                # ragged tail groups pad with a zero-mask repeat of the last
                # image so every group in a bucket shares ONE program (only
                # when a full group exists — a lone undersized bucket keeps
                # its natural batch rather than paying for phantom rows)
                while nb > 1 and i > 0 and len(imgs) < nb:
                    imgs.append(imgs[-1])
                    offs.append(offs[-1])
                    ys.append(ys[-1])
                    masks.append(np.zeros_like(masks[-1]))
                yield (np.stack(imgs), np.stack(offs), np.stack(ys),
                       np.stack(masks))

    # ---- main loop ----------------------------------------------------------

    def _synth_patch_batches(self, data, rng, device_targets):
        """Patch batches when offset/Y are synthesized: only the images move
        host→device; the (identical) target tiles stay device-resident —
        essential behind a slow-transfer tunnel."""
        cfg = self.cfg
        p = cfg.patch_lr
        off_b, y_b, mask_b = device_targets
        ids = [k for k, v in data.items() if v["X"].shape[0] >= p
               and v["X"].shape[1] >= p]
        if not ids:
            raise ValueError(f"no sample is >= {p}x{p} LR pixels")
        for _ in range(max(1, len(ids))):
            imgs = []
            for _ in range(cfg.batch_size):
                d = data[ids[rng.integers(len(ids))]]
                h, w = d["X"].shape[:2]
                y0 = int(rng.integers(h - p + 1))
                x0 = int(rng.integers(w - p + 1))
                imgs.append(d["X"][y0:y0 + p, x0:x0 + p])
            yield (np.stack(imgs), off_b, y_b, mask_b)

    def fit(self, data: dict[str, dict[str, np.ndarray]], params=None,
            epochs: int | None = None, log=print):
        import jax

        cfg = self.cfg
        params = params if params is not None else self.init_params()
        opt_state = self.optimizer.init(params)
        rng = np.random.default_rng(cfg.seed)
        epochs = epochs if epochs is not None else cfg.epochs

        synth = cfg.mode == "patch" and any(
            "Y" not in v for v in data.values())
        device_targets = None
        if synth:
            from ..data.onthefly import target_tiles
            off_tile, y_tile = target_tiles(cfg.patch_lr, cfg.scale)
            b = cfg.batch_size
            n = cfg.patch_lr * cfg.scale
            device_targets = (
                jax.device_put(np.broadcast_to(off_tile[None], (b, n, n, 2)).copy()),
                jax.device_put(np.broadcast_to(y_tile[None], (b, n, n, 16)).copy()),
                jax.device_put(np.ones((b, n, n, 1), np.float32)),
            )

        for epoch in range(epochs):
            t0 = time.perf_counter()
            losses, maes = [], []
            if synth:
                batches = self._synth_patch_batches(data, rng, device_targets)
            elif cfg.mode == "patch":
                batches = self._patch_batches(data, rng)
            else:
                batches = self._image_batches(data)
            for bi, (img, off, y, mask) in enumerate(batches):
                params, opt_state, loss, mae = self.step_fn(
                    params, opt_state, img, off, y, mask)
                losses.append(float(loss))
                maes.append(float(mae))
                if (bi + 1) % cfg.log_every == 0:
                    log(f"epoch {epoch + 1} batch {bi + 1}: "
                        f"loss={losses[-1]:.8f} mae={maes[-1]:.8f}")
            rec = {"epoch": epoch + 1,
                   "loss": float(np.mean(losses)),
                   "mae": float(np.mean(maes)),
                   "seconds": time.perf_counter() - t0}
            self.history.append(rec)
            log(f"epoch {rec['epoch']}/{epochs}: loss={rec['loss']:.8f} "
                f"mae={rec['mae']:.8f} ({rec['seconds']:.2f}s)")
        return params
