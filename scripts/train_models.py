#!/usr/bin/env python3
"""Train the shipping model checkpoints on the reference's checked-in HR set.

Produces native checkpoints under model/:
  wp-<lr>-<epochs>       weight predictor (the reference's msr/train flow)
  espcn_medium, espcn_thick  neural SR baselines (the esrgan slots)

Run on TPU: python scripts/train_models.py [--quick]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

HR_DIR = "/root/reference/version3.0/cp_image/hr_images"
# 3-id holdout (VERDICT r2 weak #6 / item 8): the generalization claim
# rests on images the trainer never saw, not a single one.
HOLDOUT_IDS = ("0020", "0691", "0886")


def _heldout_pair(image_id, scale=4):
    import numpy as np
    from bicubic_interpolation_model_tpu.ops.downsample import downsample
    from bicubic_interpolation_model_tpu.utils import imageio
    from bicubic_interpolation_model_tpu.data.div2k import align_crop

    hr = align_crop(imageio.load_rgba(f"{HR_DIR}/{image_id}.png"), scale)
    lr = np.asarray(downsample(hr, float(scale), "lanczos3"))
    return hr, lr


def evaluate_wp(model, params, holdout, scale=4):
    """Per-held-out-id PSNR/SSIM dict + mean."""
    import numpy as np
    from bicubic_interpolation_model_tpu.evaluation.metrics import compare_images
    from bicubic_interpolation_model_tpu.models.inference import super_resolve

    per = {}
    for hid in holdout:
        hr, lr = _heldout_pair(hid, scale)
        sr = np.asarray(super_resolve(model, params, lr, scale=scale,
                                      convention="train"))
        m = compare_images(hr, sr)
        per[hid] = {"psnr": m.psnr, "ssim": m.ssim}
    per["mean_psnr"] = float(np.mean([v["psnr"] for v in per.values()]))
    return per


def evaluate_direct(model, params, holdout, scale=4):
    import numpy as np
    from bicubic_interpolation_model_tpu.evaluation.metrics import compare_images
    from bicubic_interpolation_model_tpu.models.inference import super_resolve_direct

    per = {}
    for hid in holdout:
        hr, lr = _heldout_pair(hid, scale)
        sr3 = np.asarray(super_resolve_direct(model, params, lr[..., :3]))
        sr = np.concatenate(
            [sr3, np.full(sr3.shape[:2] + (1,), 255, np.uint8)], -1)
        m = compare_images(hr, sr)
        per[hid] = {"psnr": m.psnr, "ssim": m.ssim}
    per["mean_psnr"] = float(np.mean([v["psnr"] for v in per.values()]))
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=("wp", "wp_adaptive", "espcn_medium", "espcn_thick", "esrgan_lite", "esrgan_plus", "srresnet_tpu"))
    ap.add_argument("--holdout", default=",".join(HOLDOUT_IDS),
                    help="comma-separated image ids excluded from training "
                         "and used for held-out eval")
    args = ap.parse_args()
    holdout = tuple(s for s in args.holdout.split(",") if s)

    from bicubic_interpolation_model_tpu.data.onthefly import load_hr_dir
    from bicubic_interpolation_model_tpu.train import checkpoint

    t0 = time.time()
    print("loading HR set...")
    data = load_hr_dir(HR_DIR, scale=4, keep_hr=True,
                       limit=6 if args.quick else None)
    for hid in holdout:
        data.pop(hid, None)
    print(f"{len(data)} training images, holdout={holdout} "
          f"({time.time()-t0:.0f}s)")

    root = pathlib.Path(__file__).resolve().parents[1] / "model"

    for wp_variant in ("wp", "wp_adaptive"):
        if args.only not in (None, wp_variant):
            continue
        from bicubic_interpolation_model_tpu.models.weight_predictor import (
            WeightPredictor)
        from bicubic_interpolation_model_tpu.train.trainer import (
            TrainConfig, WeightPredictorTrainer)
        adaptive = wp_variant == "wp_adaptive"
        epochs = 5 if args.quick else 120
        cfg = TrainConfig(learning_rate=1e-3, epochs=epochs, mode="patch",
                          patch_lr=48, batch_size=16, log_every=10**9,
                          adaptive_targets=adaptive)
        tr = WeightPredictorTrainer(WeightPredictor(scale=4), cfg)
        params = tr.fit(data, log=print)
        name = f"wp-adaptive-1e-3-{epochs}" if adaptive else f"wp-1e-3-{epochs}"
        meta = {"model": "WeightPredictor", "scale": 4, "adaptive": adaptive,
                "train_images": len(data), "epochs": epochs,
                "holdout": list(holdout), "eval": "pending",
                "history": tr.history[-5:]}
        checkpoint.save(root / name, params, meta=meta)   # survive eval crash
        ev = evaluate_wp(tr.model, params, holdout)
        print(f"{wp_variant} held-out eval: {ev}")
        checkpoint.save(root / name, params, meta={**meta, "eval": ev})

    from bicubic_interpolation_model_tpu.models.espcn import MODEL_ZOO
    from bicubic_interpolation_model_tpu.train.direct_trainer import (
        DirectSRConfig, DirectSRTrainer)
    for name in ("espcn_medium", "espcn_thick", "esrgan_lite", "esrgan_plus",
                 "srresnet_tpu"):
        if args.only not in (None, name):
            continue
        epochs = 3 if args.quick else {
            "espcn_medium": 60, "espcn_thick": 90, "esrgan_lite": 140,
            "esrgan_plus": 240, "srresnet_tpu": 300}[name]
        # the flagship trains with 8-fold dihedral augmentation and a
        # slower anneal: the 33-image set is the ceiling (README), and
        # augmentation is the standard lever for it
        augment = name == "srresnet_tpu"
        cfg = DirectSRConfig(learning_rate=1e-3, epochs=epochs,
                             steps_per_epoch=60, patch_lr=32, batch_size=16,
                             augment=augment,
                             lr_decay=0.98 if augment else 0.97)
        model = MODEL_ZOO[name](scale=4)
        tr = DirectSRTrainer(model, cfg)
        params = tr.fit(data, log=print)
        # save BEFORE eval: a dropped TPU tunnel during the (minutes-long)
        # full-image eval must not lose the training run
        meta = {"model": name, "scale": 4, "train_images": len(data),
                "epochs": epochs, "holdout": list(holdout),
                "augment": augment, "lr_decay": cfg.lr_decay,
                "eval": "pending", "history": tr.history[-5:]}
        checkpoint.save(root / name, params, meta=meta)
        ev = evaluate_direct(tr.model, params, holdout)
        print(f"{name} held-out eval: {ev}")
        checkpoint.save(root / name, params, meta={**meta, "eval": ev})

    print(f"done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
