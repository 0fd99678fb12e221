#!/usr/bin/env python3
"""Train the v1.0 PatchMLP and v2.0 PixelMLP weight predictors end-to-end
(reference version1.0/utils/train.js:46-66, version2.0/utils/train.js:54-90)
and save checkpoints under model/{patch-mlp,pixel-mlp}.

Training pairs are sampled per HR pixel: features = the flattened 4x4xC LR
patch of the pixel's base cell (v1), plus the (dx, dy) subpixel offsets (v2);
targets = the ground-truth normalized Keys weights, which under the training
convention are an SxS-periodic tile (data/onthefly.py).

Note on v1: without the offsets the target is not a function of the input —
all S^2 phases of a cell share one patch but have different GT weights — so
the best a PatchMLP can learn is the phase-average. That is WHY the
reference abandoned v1 (its train.js is 0 bytes); we train it anyway to
quantify the design's ceiling honestly. Runs fine on CPU:
    JAX_PLATFORM_NAME=cpu python scripts/train_mlps.py [--quick]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

HR_DIR = "/root/reference/version3.0/cp_image/hr_images"
HOLDOUT_IDS = ("0020", "0691", "0886")
SCALE = 4


def build_samples(data, n_per_image, seed=0):
    from bicubic_interpolation_model_tpu.data.onthefly import target_tiles

    off_tile, y_tile = target_tiles(1, SCALE)        # [S,S,2], [S,S,16]
    rng = np.random.default_rng(seed)
    feats, offs, targs = [], [], []
    for rec in data.values():
        lr = rec["X"]                                # [Hl,Wl,C] float/255
        hl, wl, c = lr.shape
        pad = np.pad(lr, ((1, 2), (1, 2), (0, 0)), mode="edge")
        ys = rng.integers(0, hl * SCALE, n_per_image)
        xs = rng.integers(0, wl * SCALE, n_per_image)
        yc, xc = ys // SCALE, xs // SCALE
        patch = np.stack([pad[yc + dy, xc + dx]
                          for dy in range(4) for dx in range(4)],
                         axis=1)                     # [N,16,C]
        feats.append(patch.reshape(len(ys), -1).astype(np.float32))
        offs.append(off_tile[ys % SCALE, xs % SCALE].astype(np.float32))
        targs.append(y_tile[ys % SCALE, xs % SCALE].astype(np.float32))
    return (np.concatenate(feats), np.concatenate(offs),
            np.concatenate(targs))


def evaluate(model, params, include_offsets):
    """Per-held-out-id PSNR/SSIM dict + mean (VERDICT r2 item 8)."""
    from bicubic_interpolation_model_tpu.data.div2k import align_crop
    from bicubic_interpolation_model_tpu.evaluation.metrics import (
        compare_images,
    )
    from bicubic_interpolation_model_tpu.models.mlp_predictor import (
        super_resolve_mlp,
    )
    from bicubic_interpolation_model_tpu.ops.downsample import downsample_np
    from bicubic_interpolation_model_tpu.utils import imageio

    per = {}
    for hid in HOLDOUT_IDS:
        hr = align_crop(imageio.load_rgba(f"{HR_DIR}/{hid}.png"), SCALE)
        lr = downsample_np(hr, float(SCALE), "lanczos3")
        sr = np.asarray(super_resolve_mlp(model, params, lr, scale=SCALE,
                                          include_offsets=include_offsets))
        m = compare_images(hr, sr)
        per[hid] = {"psnr": m.psnr, "ssim": m.ssim, "mse": m.mse}
    per["mean_psnr"] = float(np.mean([v["psnr"] for v in per.values()]))
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from bicubic_interpolation_model_tpu.data.onthefly import load_hr_dir
    from bicubic_interpolation_model_tpu.models.mlp_predictor import (
        PatchMLP, PixelMLP,
    )
    from bicubic_interpolation_model_tpu.train import checkpoint
    from bicubic_interpolation_model_tpu.train.mlp_trainer import (
        MLPTrainConfig, train_pixel_mlp,
    )

    t0 = time.time()
    data = load_hr_dir(HR_DIR, scale=SCALE, keep_hr=False,
                       limit=6 if args.quick else 20)
    for hid in HOLDOUT_IDS:
        data.pop(hid, None)
    n_per = 2000 if args.quick else 30000
    feats, offs, targs = build_samples(data, n_per)
    print(f"{len(data)} images, {feats.shape[0]} samples "
          f"({time.time()-t0:.0f}s)")

    root = pathlib.Path(__file__).resolve().parents[1] / "model"
    epochs = 5 if args.quick else 200
    cfg = MLPTrainConfig(learning_rate=0.03, epochs=epochs, batch_size=8192,
                         patience=8)

    for name, model, x, include_off in [
        ("patch-mlp", PatchMLP(), feats, False),
        ("pixel-mlp", PixelMLP(),
         np.concatenate([feats, offs], axis=1), True),
    ]:
        print(f"--- training {name} on {x.shape} ---")
        params, history = train_pixel_mlp(model, x, targs, cfg,
                                          log=lambda s: None)
        print(f"final loss {history[-1]:.6f} ({len(history)} epochs)")
        ev = evaluate(model, params, include_off)
        print(f"{name} held-out eval: {ev}")
        checkpoint.save(root / name, params, meta={
            "model": type(model).__name__, "scale": SCALE,
            "include_offsets": include_off,
            "train_images": len(data), "samples": int(x.shape[0]),
            "epochs": len(history),
            "holdout": list(HOLDOUT_IDS), "eval": ev,
            "history": history[-5:]})
    print(f"done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
