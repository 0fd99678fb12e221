#!/usr/bin/env python3
"""Produce the framework's quality table (the reference's metrics_report.csv
flow) over the checked-in HR images: LR = lanczos3 /4 downsample, rebuild with
every method (classical + learned + neural baselines), PSNR/SSIM/MSE vs HR.

Writes results/metrics_report.csv and prints the per-method averages.
Note: the learned checkpoints were trained on these HR images EXCEPT the
3-id holdout 0020/0691/0886 — those rows are the honest generalization
numbers (results/README.md caveat 1).

Run on CPU (quality, not perf): JAX_PLATFORM_NAME=cpu python scripts/quality_table.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REF = pathlib.Path("/root/reference/version3.0")
IDS = ["0020", "0691", "0802", "0803", "0843", "0886"]
SCALE = 4


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", default="",
                    help="comma subset of image ids to (re)compute; rows "
                         "for other ids are kept from the existing CSV and "
                         "the AVERAGE rows recomputed over the merged set")
    ap.add_argument("--methods", default="",
                    help="comma subset of method names to (re)compute "
                         "(matches the CSV METHOD column); other rows kept")
    ap.add_argument("--backend", default="cpu", choices=("cpu", "tpu"),
                    help="cpu (default, reproducible anywhere) or tpu")
    args = ap.parse_args()
    run_ids = args.ids.split(",") if args.ids else list(IDS)
    run_methods = set(args.methods.split(",")) if args.methods else None
    try:
        # must run before backend init (jax.default_backend would initialize)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_platform_name", "cpu")
    except Exception:
        pass

    from bicubic_interpolation_model_tpu.data.div2k import align_crop
    from bicubic_interpolation_model_tpu.evaluation import compare as cmp
    from bicubic_interpolation_model_tpu.evaluation.metrics import compare_images
    from bicubic_interpolation_model_tpu.models.inference import (
        super_resolve, super_resolve_direct)
    from bicubic_interpolation_model_tpu.models.tfjs_import import (
        load_weight_predictor)
    from bicubic_interpolation_model_tpu.ops.adaptive import adaptive_resize
    from bicubic_interpolation_model_tpu.ops.downsample import downsample_np
    from bicubic_interpolation_model_tpu.ops.resize import resize
    from bicubic_interpolation_model_tpu.train import checkpoint
    from bicubic_interpolation_model_tpu.utils import imageio

    root = pathlib.Path(__file__).resolve().parents[1]

    # learned models
    ref_model, ref_params = load_weight_predictor(REF / "model" / "1e-3-30")
    own = {}
    wp_list = []
    for wp_dir in sorted((root / "model").glob("wp-*")):
        from bicubic_interpolation_model_tpu.models.weight_predictor import (
            init_params)
        import jax as _jax
        m, template = init_params(_jax.random.key(0))
        p, _ = checkpoint.load(wp_dir, template)
        wp_list.append((m, p, wp_dir.name))
    for name in ("espcn_medium", "espcn_thick", "esrgan_lite", "esrgan_plus",
                 "srresnet_tpu"):
        d = root / "model" / name
        if d.exists():
            from bicubic_interpolation_model_tpu.models.espcn import MODEL_ZOO
            import jax as _jax
            m = MODEL_ZOO[name](scale=SCALE)
            template = m.init(_jax.random.key(0),
                              np.zeros((1, 8, 8, 3), np.float32))
            p, _ = checkpoint.load(d, template)
            own[name] = (m, p, name)

    # v1.0 / v2.0 MLP weight predictors (scripts/train_mlps.py)
    mlps = []
    from bicubic_interpolation_model_tpu.models.mlp_predictor import (
        PatchMLP, PixelMLP, super_resolve_mlp)
    for name, model, n_feat, include_off in [
            ("patch-mlp", PatchMLP(), 64, False),
            ("pixel-mlp", PixelMLP(), 66, True)]:
        d = root / "model" / name
        if d.exists():
            import jax as _jax
            template = model.init(_jax.random.key(0),
                                  np.zeros((1, n_feat), np.float32))
            p, _ = checkpoint.load(d, template)
            mlps.append((name, model, p, include_off))

    results = []
    for image_id in run_ids:
        hr = align_crop(imageio.load_rgba(REF / "cp_image" / "hr_images"
                                          / f"{image_id}.png"), SCALE)
        lr = downsample_np(hr, float(SCALE), "lanczos3")

        def direct(m, p):
            sr3 = np.asarray(super_resolve_direct(m, p, lr[..., :3]))
            return np.concatenate(
                [sr3, np.full(sr3.shape[:2] + (1,), 255, np.uint8)], -1)

        rebuilds = {
            "nearest": lambda: np.asarray(resize(lr, SCALE, "nearest")),
            "bilinear": lambda: np.asarray(resize(lr, SCALE, "bilinear")),
            "bicubic_-0.5": lambda: np.asarray(resize(lr, SCALE, "bicubic")),
            "lanczos": lambda: np.asarray(resize(lr, SCALE, "lanczos")),
            "adaptive_bicubic_-0.5":
                lambda: np.asarray(adaptive_resize(lr, SCALE)),
            "ref_1e-3-30": lambda: np.asarray(super_resolve(
                ref_model, ref_params, lr, scale=SCALE, convention="train")),
        }
        for (m, p, name) in wp_list:
            rebuilds[name] = (lambda m=m, p=p: np.asarray(super_resolve(
                m, p, lr, scale=SCALE, convention="train")))
        for key in ("espcn_medium", "espcn_thick", "esrgan_lite",
                    "esrgan_plus", "srresnet_tpu"):
            if key in own:
                m, p, name = own[key]
                rebuilds[name] = (lambda m=m, p=p: direct(m, p))
        for (name, m, p, include_off) in mlps:
            rebuilds[name] = (
                lambda m=m, p=p, io=include_off: np.asarray(super_resolve_mlp(
                    m, p, lr, scale=SCALE, include_offsets=io)))

        for method, mk in rebuilds.items():
            if run_methods is not None and method not in run_methods:
                continue
            sr = mk()
            met = compare_images(hr, sr)
            results.append(cmp.CompareResult(image_id, method, met))
            print(f"[{image_id}/{method}] PSNR={met.psnr:.2f} "
                  f"SSIM={met.ssim:.4f} MSE={met.mse:.2f}")

    out = root / "results" / "metrics_report.csv"
    if out.exists() and (set(run_ids) != set(IDS)
                     or run_methods is not None):
        from bicubic_interpolation_model_tpu.evaluation.metrics import Metrics
        seen = {(r.image_id, r.method) for r in results}
        for line in out.read_text().splitlines()[1:]:
            image_id, method, psnr, ssim, mse = line.split(",")
            if image_id == "AVERAGE" or (image_id, method) in seen:
                continue
            results.append(cmp.CompareResult(
                image_id, method,
                Metrics(psnr=float(psnr), ssim=float(ssim),
                        mse=float(mse))))
        results.sort(key=lambda r: (r.image_id, r.method))
    avgs = cmp.method_averages(results)
    cmp.export_csv(out, results, avgs)
    print(f"\n→ {out}\nMETHOD                  PSNR     SSIM      MSE")
    for mname, v in sorted(avgs.items(), key=lambda kv: kv[1].psnr):
        print(f"{mname:<22} {v.psnr:7.2f} {v.ssim:8.4f} {v.mse:9.2f}")


if __name__ == "__main__":
    main()
