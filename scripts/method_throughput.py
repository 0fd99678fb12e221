#!/usr/bin/env python3
"""Measure per-method throughput on the real chip and write
results/method_throughput.json — the framework's version of the reference's
8-method cp_performance sweep (SURVEY §6).

Classical kernels run at 1080p→4x (the headline geometry). The adaptive
kernel and every learned/neural model run at the reference's own benchmark
geometry (image 0020: LR 510x348 → 2040x1392, cp_performance/*.csv) so the
`reference_ms` / `speedup` columns compare like for like.

All timings use the chained-K on-device methodology (bench.suite): K
forwards inside one jit via fori_loop with per-iteration input perturbation,
per-frame time = slope between two K values.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

# reference wall-clock (ms, best run) from cp_performance/*/*.csv
REFERENCE_MS = {
    "nearest": 30.1, "bilinear": 137.6, "bicubic": 7312.6, "lanczos": 6807.9,
    "adaptive_bicubic": 26848.6, "model_1e-3-30": 7580.3,
    "espcn_medium": 2452.6, "espcn_thick": 16434.1,
}
LR_H, LR_W, SCALE = 348, 510, 4   # image 0020 geometry


def chained_bench(fn, img, k_lo=3, k_hi=15, reps=3):
    # shared implementation — see bench/suite.py (one methodology for every
    # chained-K row in the artifacts)
    from bicubic_interpolation_model_tpu.bench.suite import (
        chained_bench as _cb)
    return _cb(fn, img, k_lo=k_lo, k_hi=k_hi, reps=reps)


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_resize_ondevice, check_parity)

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma list of sections to re-measure (classical,"
                         "adaptive,learned,neural,rational,train,downsample)"
                         "; default all. Other sections keep their previous "
                         "JSON rows.")
    args = ap.parse_args()
    sections = set(filter(None, args.only.split(","))) or {
        "classical", "adaptive", "learned", "neural", "rational", "train",
        "downsample"}

    root = pathlib.Path(__file__).resolve().parents[1]
    res = root / "results"
    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas_phase" if on_tpu else "matmul"
    out = {}
    prev_path = res / "method_throughput.json"
    if prev_path.exists():
        out = json.loads(prev_path.read_text())
    out_pix_0020 = (LR_H * SCALE) * (LR_W * SCALE)

    def want(section):
        return section in sections

    # ---- classical kernels at 1080p→4x (headline geometry) ----
    # The primary row is the best *delivered interleaved-HWC* path, i.e.
    # what serving.Upscaler actually routes: on TPU the vM banded-matmul
    # kernel (ops/pallas_mxu), with the round-2 phase path kept as a
    # secondary column for continuity.
    for method in ("nearest", "bilinear", "lanczos", "bicubic") \
            if want("classical") else ():
        candidates = ("pallas_mxu", "pallas_phase") if on_tpu else (impl,)
        cands = []
        for cimpl in candidates:
            r = bench_resize_ondevice(1080, 1920, 4, method, impl=cimpl)
            d = check_parity(4, method, impl=cimpl, h=96, w=64)
            cands.append({"ms_per_frame": r["ms_per_frame"],
                          "gpix_per_s": r["gpix_per_s"], "max_u8_delta": d,
                          "geometry": "1080p->4x", "impl": cimpl})
        ok = [c for c in cands if c["max_u8_delta"] <= 1] or cands
        row = max(ok, key=lambda c: c["gpix_per_s"])
        for c in cands:
            if c is not row and c["impl"] == "pallas_phase":
                row["phase_hwc_gpix_per_s"] = c["gpix_per_s"]
        if method == "bicubic" and on_tpu:
            rp = bench_resize_ondevice(1080, 1920, 4, method,
                                       impl="pallas_phase_planar")
            row["planar_gpix_per_s"] = rp["gpix_per_s"]
        out[method] = row
        print(method, row)

    rng = np.random.default_rng(0)
    lr_u8 = jax.device_put(
        rng.integers(0, 256, (LR_H, LR_W, 4), np.uint8))

    # ---- adaptive bicubic at the reference's 0020 geometry ----
    if want("adaptive"):
        from bicubic_interpolation_model_tpu.bench.suite import (
            bench_program_output)
        from bicubic_interpolation_model_tpu.ops.adaptive import (
            adaptive_resize)
        best = None
        for aimpl in (("pallas", "jnp") if on_tpu else ("jnp",)):
            if aimpl == "pallas":
                # planar is the serving layout (kernel output, fully
                # materialized by pallas); HWC is a u32→u8 layout boundary
                # — report its honest program-output cost separately
                from bicubic_interpolation_model_tpu.ops.pallas_adaptive \
                    import adaptive_resize_pallas
                fn = lambda x: adaptive_resize_pallas(
                    x, SCALE, -0.5, layout="planar")
                fn_hwc = lambda x: adaptive_resize_pallas(x, SCALE, -0.5)
                fn_hwc32 = lambda x: adaptive_resize_pallas(
                    x, SCALE, -0.5, layout="hwc32")
            else:
                fn = fn_hwc = lambda x: adaptive_resize(
                    x, SCALE, -0.5, impl=aimpl)
            per = chained_bench(fn, lr_u8)
            row = {
                "ms_per_frame": per * 1e3,
                "gpix_per_s": out_pix_0020 / per / 1e9,
                "impl": aimpl,
                "layout": "planar_u32" if aimpl == "pallas" else "hwc",
                "hwc_program_output_ms":
                    bench_program_output(fn_hwc, lr_u8) * 1e3,
                **({"hwc32_program_output_ms":
                    bench_program_output(fn_hwc32, lr_u8) * 1e3}
                   if aimpl == "pallas" else {}),
                "reference_ms": REFERENCE_MS["adaptive_bicubic"],
                "speedup": REFERENCE_MS["adaptive_bicubic"] / (per * 1e3),
            }
            print("adaptive_bicubic_0020", row)
            if best is None or row["gpix_per_s"] > best["gpix_per_s"]:
                best = row
        out["adaptive_bicubic_0020"] = best
        # headline geometry for the adaptive kernel as well
        lr_1080 = jax.device_put(
            rng.integers(0, 256, (1080, 1920, 4), np.uint8)) \
            if on_tpu else None
        if on_tpu:
            from bicubic_interpolation_model_tpu.core.oracle import (
                adaptive_bicubic_oracle)
            from bicubic_interpolation_model_tpu.ops.pallas_adaptive \
                import adaptive_resize_pallas
            per = chained_bench(
                lambda x: adaptive_resize_pallas(
                    x, 4, -0.5, layout="planar"), lr_1080)
            # on-hardware parity at a geometry spanning BOTH tile axes
            # (h > step, w > wstep)
            pimg = rng.integers(0, 256, (40, 600, 4), np.uint8)
            pwant = adaptive_bicubic_oracle(pimg, 4.0).astype(np.int64)
            pgot = np.asarray(adaptive_resize_pallas(
                jax.device_put(pimg), 4, -0.5)).astype(np.int64)
            delta = int(np.abs(pgot - pwant).max())
            out["adaptive_bicubic_0020"]["max_u8_delta_tpu"] = delta
            out["adaptive_bicubic_1080p"] = {
                "ms_per_frame": per * 1e3,
                "gpix_per_s": 1080 * 1920 * 16 / per / 1e9,
                "impl": "pallas", "layout": "planar_u32",
                "geometry": "1080p->4x",
                "max_u8_delta_tpu": delta,
            }
            print("adaptive_bicubic_1080p", out["adaptive_bicubic_1080p"])

    # ---- rational (non-integer) scales at 1080p: phase vs matmul ----
    if want("rational"):
        from bicubic_interpolation_model_tpu.bench.suite import _make_input
        from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
        from bicubic_interpolation_model_tpu.ops.resize import resize
        for scale in (1.5, 2.5):
            rows = {}
            rimpls = (("pallas_mxu", "phase", "matmul") if on_tpu
                      else ("phase", "matmul"))
            for rimpl in rimpls:
                r = bench_resize_ondevice(1080, 1920, scale, "bicubic",
                                          impl=rimpl)
                small = _make_input(96, 64)
                if rimpl == "pallas_mxu":
                    from bicubic_interpolation_model_tpu.ops.pallas_mxu \
                        import resize_mxu
                    got = np.asarray(resize_mxu(small, scale, "bicubic"),
                                     dtype=np.int64)
                else:
                    got = np.asarray(
                        resize(small, scale, "bicubic", impl=rimpl),
                        dtype=np.int64)
                ref = resize_oracle(small, scale, "bicubic").astype(np.int64)
                rows[rimpl] = {
                    "ms_per_frame": r["ms_per_frame"],
                    "gpix_per_s": r["gpix_per_s"],
                    "max_u8_delta": int(np.abs(got - ref).max()),
                }
                print(f"bicubic_{scale}x_{rimpl}", rows[rimpl])
            ok = {k: v for k, v in rows.items() if v["max_u8_delta"] <= 1} \
                or rows
            primary = max(ok, key=lambda k: ok[k]["gpix_per_s"])
            # stable schema: every measured impl gets its named column
            # (including the primary), so round-over-round diffs never
            # lose keys when the parity-gated winner changes
            out[f"bicubic_{scale}x_1080p"] = {
                "geometry": f"1080p->{scale}x", **rows[primary],
                "impl": primary,
                **{f"{k}_gpix_per_s": v["gpix_per_s"]
                   for k, v in rows.items()},
            }

    # ---- learned weight-predictor paths (fused predict+apply) ----
    from bicubic_interpolation_model_tpu.evaluation.model_analysis import (
        _load_model_any)
    from bicubic_interpolation_model_tpu.models.inference import (
        super_resolve)

    wp_dirs = {"ref_1e-3-30": "/root/reference/version3.0/model/1e-3-30"}
    for d in sorted((root / "model").glob("wp-*")):
        wp_dirs[d.name] = str(d)
    if not want("learned"):
        wp_dirs = {}
    if wp_dirs:
        from bicubic_interpolation_model_tpu.bench.suite import (
            bench_program_output)
    for name, d in wp_dirs.items():
        model, params = _load_model_any(d)
        fn = lambda x: super_resolve(model, params, x, SCALE, "train")
        per = chained_bench(fn, lr_u8)
        # BOTH timing boundaries are published (round-3 weak #2): chained
        # strided-checksum (what a fused pipeline consumer pays) and
        # program-output (full u8 HWC frame materialized per dispatch —
        # the serving boundary). The gap between them is delivery, not
        # compute.
        po = bench_program_output(fn, lr_u8)
        ref = REFERENCE_MS["model_1e-3-30"]
        out[name] = {"ms_per_frame": per * 1e3,
                     "program_output_ms": po * 1e3,
                     "gpix_per_s": out_pix_0020 / per / 1e9,
                     "reference_ms": ref, "speedup": ref / (per * 1e3),
                     "impl": "packed forward, fused Pallas tail on TPU "
                             "(bf16 model stages)",
                     "note": "phase-packed predict+apply, one jit program"}
        print(name, out[name])

    # ---- direct neural baselines (the reference's esrgan slots) ----
    from bicubic_interpolation_model_tpu.models.espcn import MODEL_ZOO
    from bicubic_interpolation_model_tpu.models.inference import _apply_direct
    from bicubic_interpolation_model_tpu.train import checkpoint

    lr_f = jnp.asarray(np.asarray(lr_u8)[..., :3], jnp.float32) / 255.0
    for name, ref_key in (("espcn_medium", "espcn_medium"),
                          ("espcn_thick", "espcn_thick"),
                          ("esrgan_lite", "espcn_thick"),
                          ("esrgan_plus", "espcn_thick"),
                          ("srresnet_tpu", "espcn_thick")):
        d = root / "model" / name
        if not d.exists() or not want("neural"):
            continue
        model = MODEL_ZOO[name](scale=SCALE)
        template = model.init(jax.random.key(0),
                              np.zeros((1, 8, 8, 3), np.float32))
        params, _ = checkpoint.load(d, template)
        fn = lambda x: _apply_direct(model, params, x[None])[0]
        per = chained_bench(fn, lr_f)
        from bicubic_interpolation_model_tpu.bench.suite import (
            bench_program_output)
        po = bench_program_output(fn, lr_f)
        ref = REFERENCE_MS[ref_key]
        out[name] = {"ms_per_frame": per * 1e3,
                     "program_output_ms": po * 1e3,
                     "gpix_per_s": out_pix_0020 / per / 1e9,
                     "reference_ms": ref, "speedup": ref / (per * 1e3)}
        print(name, out[name])

    # ---- LR generation (make-lr / data-gen downsample) — the entry point
    # of every workflow; the reference delegates HR→LR to sharp
    # (version3.0/utils/model_super_resolution.js:20-32,
    # data_generator.js:62-88), which checks in no timing, so these rows
    # carry no reference_ms column. Measured at the 0020 HR geometry
    # (1392x2040 → /4) and 4K → /4.
    if want("downsample"):
        from bicubic_interpolation_model_tpu.ops.downsample import downsample
        for label, (hh, ww) in (("downsample_0020_4x", (1392, 2040)),
                                ("downsample_4k_4x", (2160, 3840))):
            hr_u8 = jax.device_put(
                rng.integers(0, 256, (hh, ww, 4), np.uint8))
            for filt in ("lanczos3", "bicubic"):
                per = chained_bench(
                    lambda x, f=filt: downsample(x, float(SCALE), f), hr_u8)
                row = {"ms_per_frame": per * 1e3,
                       "in_mpix_per_s": hh * ww / per / 1e6,
                       "filter": filt, "geometry": f"{hh}x{ww}->/4"}
                out[f"{label}_{filt}"] = row
                print(f"{label}_{filt}", row)

    # ---- training-step throughput (no reference number exists — the
    # reference's train.js logs epochs but checks in no timings) ----
    if want("train"):
        import optax

        from bicubic_interpolation_model_tpu.models.weight_predictor import (
            WeightPredictor)
        from bicubic_interpolation_model_tpu.ops.learned import (
            gt_weight_map, offset_map)
        from bicubic_interpolation_model_tpu.train.trainer import (
            make_weight_predictor_step)

        model = WeightPredictor(scale=SCALE)
        optimizer = optax.adam(1e-4)
        step = make_weight_predictor_step(model, optimizer, scale=SCALE)

        def bench_train(img, off, y, mask, label):
            params = model.init(
                jax.random.key(0), img[:1], off[:1])
            opt_state = optimizer.init(params)

            @jax.jit
            def chained(img, off, y, mask, params, opt_state, k):
                def body(i, carry):
                    params, opt_state, acc = carry
                    params, opt_state, loss, _ = step(
                        params, opt_state,
                        img + i.astype(jnp.float32) * 1e-6, off, y, mask)
                    return params, opt_state, acc + loss
                return jax.lax.fori_loop(
                    0, k, body, (params, opt_state, jnp.float32(0)))[2]

            float(np.asarray(chained(img, off, y, mask, params,
                                     opt_state, 1)))

            def timed(k):
                best = np.inf
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(np.asarray(chained(img, off, y, mask, params,
                                             opt_state, k)))
                    best = min(best, time.perf_counter() - t0)
                return best

            from bicubic_interpolation_model_tpu.bench.suite import (
                chained_slope)
            per = chained_slope(timed, 2, 12)
            row = {"ms_per_step": per * 1e3,
                   "images_per_s": img.shape[0] / per,
                   "lr_mpix_per_s": img.shape[0] * img.shape[1]
                   * img.shape[2] / per / 1e6}
            out[label] = row
            print(label, row)

        # whole-image batches at the 0020 bucketed geometry (image mode)
        hb, wb = 352, 512
        img = jnp.asarray(rng.random((1, hb, wb, 4), np.float32))
        off = jnp.broadcast_to(offset_map(
            hb * SCALE, wb * SCALE, float(SCALE), "train")[None],
            (1, hb * SCALE, wb * SCALE, 2))
        y = jnp.broadcast_to(gt_weight_map(
            hb * SCALE, wb * SCALE, float(SCALE))[None],
            (1, hb * SCALE, wb * SCALE, 16))
        mask = jnp.ones((1, hb * SCALE, wb * SCALE, 1), jnp.float32)
        bench_train(img, off, y, mask, "train_step_image_0020")

        # patch mode: batch of 16 x 48^2 LR patches (the default config)
        p16, b = 48, 16
        img = jnp.asarray(rng.random((b, p16, p16, 4), np.float32))
        off = jnp.broadcast_to(offset_map(
            p16 * SCALE, p16 * SCALE, float(SCALE), "train")[None],
            (b, p16 * SCALE, p16 * SCALE, 2))
        y = jnp.broadcast_to(gt_weight_map(
            p16 * SCALE, p16 * SCALE, float(SCALE))[None],
            (b, p16 * SCALE, p16 * SCALE, 16))
        mask = jnp.ones((b, p16 * SCALE, p16 * SCALE, 1), jnp.float32)
        bench_train(img, off, y, mask, "train_step_patch16x48")

    res = root / "results"
    res.mkdir(exist_ok=True)
    (res / "method_throughput.json").write_text(json.dumps(out, indent=2))
    print(f"→ {res / 'method_throughput.json'}")


if __name__ == "__main__":
    main()
