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
EVAL_ID = "0020"


def evaluate_wp(model, params, scale=4):
    import numpy as np
    from bicubic_interpolation_model_tpu.evaluation.metrics import compare_images
    from bicubic_interpolation_model_tpu.models.inference import super_resolve
    from bicubic_interpolation_model_tpu.ops.downsample import downsample
    from bicubic_interpolation_model_tpu.utils import imageio
    from bicubic_interpolation_model_tpu.data.div2k import align_crop

    hr = align_crop(imageio.load_rgba(f"{HR_DIR}/{EVAL_ID}.png"), scale)
    lr = np.asarray(downsample(hr, float(scale), "lanczos3"))
    sr = np.asarray(super_resolve(model, params, lr, scale=scale,
                                  convention="train"))
    return compare_images(hr, sr)


def evaluate_direct(model, params, scale=4):
    import numpy as np
    from bicubic_interpolation_model_tpu.evaluation.metrics import compare_images
    from bicubic_interpolation_model_tpu.models.inference import super_resolve_direct
    from bicubic_interpolation_model_tpu.ops.downsample import downsample
    from bicubic_interpolation_model_tpu.utils import imageio
    from bicubic_interpolation_model_tpu.data.div2k import align_crop

    hr = align_crop(imageio.load_rgba(f"{HR_DIR}/{EVAL_ID}.png"), scale)
    lr = np.asarray(downsample(hr, float(scale), "lanczos3"))
    sr3 = np.asarray(super_resolve_direct(model, params, lr[..., :3]))
    import numpy as np
    sr = np.concatenate([sr3, np.full(sr3.shape[:2] + (1,), 255, np.uint8)], -1)
    return compare_images(hr, sr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=("wp", "wp_adaptive", "espcn_medium", "espcn_thick", "esrgan_lite", "esrgan_plus"))
    args = ap.parse_args()

    from bicubic_interpolation_model_tpu.data.onthefly import load_hr_dir
    from bicubic_interpolation_model_tpu.train import checkpoint

    t0 = time.time()
    print("loading HR set...")
    data = load_hr_dir(HR_DIR, scale=4, keep_hr=True,
                       limit=6 if args.quick else None)
    # hold out the eval image
    data.pop(EVAL_ID, None)
    print(f"{len(data)} training images ({time.time()-t0:.0f}s)")

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
        m = evaluate_wp(tr.model, params)
        print(f"{wp_variant} eval on {EVAL_ID}: PSNR={m.psnr:.2f} SSIM={m.ssim:.4f}")
        name = f"wp-adaptive-1e-3-{epochs}" if adaptive else f"wp-1e-3-{epochs}"
        checkpoint.save(root / name, params, meta={
            "model": "WeightPredictor", "scale": 4, "adaptive": adaptive,
            "train_images": len(data), "epochs": epochs,
            "eval": {"image": EVAL_ID, "psnr": m.psnr, "ssim": m.ssim},
            "history": tr.history[-5:]})

    from bicubic_interpolation_model_tpu.models.espcn import MODEL_ZOO
    from bicubic_interpolation_model_tpu.train.direct_trainer import (
        DirectSRConfig, DirectSRTrainer)
    for name in ("espcn_medium", "espcn_thick", "esrgan_lite", "esrgan_plus"):
        if args.only not in (None, name):
            continue
        epochs = 3 if args.quick else {"espcn_medium": 60, "espcn_thick": 90, "esrgan_lite": 140, "esrgan_plus": 240}[name]
        cfg = DirectSRConfig(learning_rate=1e-3, epochs=epochs,
                             steps_per_epoch=60, patch_lr=32, batch_size=16)
        model = MODEL_ZOO[name](scale=4)
        tr = DirectSRTrainer(model, cfg)
        params = tr.fit(data, log=print)
        m = evaluate_direct(tr.model, params)
        print(f"{name} eval on {EVAL_ID}: PSNR={m.psnr:.2f} SSIM={m.ssim:.4f}")
        checkpoint.save(root / name, params, meta={
            "model": name, "scale": 4, "train_images": len(data),
            "epochs": epochs,
            "eval": {"image": EVAL_ID, "psnr": m.psnr, "ssim": m.ssim},
            "history": tr.history[-5:]})

    print(f"done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
