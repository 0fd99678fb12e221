#!/usr/bin/env python3
"""Measure every BASELINE.json config on the real chip and write
results/bench_configs.json.

1. 256x256 gray, 2x bicubic
2. 512x512 RGB(A), 4x with edge clamp
3. batch of 64 RGBA images, mixed 2x/3x/4x (bucketed jit cache: one compiled
   program per scale, vmap over the batch slice)
4. 4K (3840x2160) RGBA frame, 4x (tiled kernel, ~530 MB u8 output)
5. 1080p stream 2x — sustained fps on one chip (mesh scaling is validated by
   __graft_entry__.dryrun_multichip; only one real chip exists here)

All timings use the chained-K on-device methodology (bench.suite).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_resize_ondevice, chained_slope, check_parity)
    from bicubic_interpolation_model_tpu.ops.pallas_phase import (
        resize_phase_pallas)

    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas_phase" if on_tpu else "matmul"
    out = {"backend": jax.default_backend(),
           "impl": "best(pallas_mxu, pallas_phase)" if on_tpu else impl,
           "configs": {}}

    # 1-2, 4-5: single-frame configs — best delivered-HWC path that keeps
    # ±1-LSB parity (on TPU: the vM banded-matmul kernel vs the phase
    # kernel, i.e. what serving.Upscaler auto-routes)
    for key, (h, w, s) in {
        "c1_256_gray_2x": (256, 256, 2),
        "c2_512_rgb_4x": (512, 512, 4),
        "c4_4k_4x": (2160, 3840, 4),
        "c5_1080p_2x_stream": (1080, 1920, 2),
    }.items():
        cands = []
        for cimpl in (("pallas_mxu", "pallas_phase") if on_tpu else (impl,)):
            r = bench_resize_ondevice(h, w, s, "bicubic", impl=cimpl)
            r["impl"] = cimpl
            r["max_u8_delta"] = check_parity(s, "bicubic", impl=cimpl)
            cands.append(r)
        ok = [c for c in cands if c["max_u8_delta"] <= 1] or cands
        r = max(ok, key=lambda c: c["gpix_per_s"])
        if key == "c5_1080p_2x_stream":
            r["fps"] = 1e3 / r["ms_per_frame"]
        out["configs"][key] = r
        print(key, r)

    # c1 companion: the same 256² gray frames microbatched 8-up through the
    # banded-matmul kernel (the batch rides the Pallas grid) — what
    # serving.Upscaler.stream(microbatch='auto') dispatches for small
    # frames, where per-launch overhead dominates single-frame c1.
    if on_tpu:
        from bicubic_interpolation_model_tpu.bench.suite import _make_input
        from bicubic_interpolation_model_tpu.ops.pallas_mxu import resize_mxu
        one = _make_input(256, 256)   # c=4, same input as the c1 row
        b8 = jax.device_put(
            np.stack([one ^ np.uint8(i) for i in range(8)]))

        @jax.jit
        def mb_k(b, k):
            def body(i, acc):
                y = resize_mxu(b ^ i.astype(jnp.uint8), 2.0, "bicubic",
                               layout="flat")
                return acc + jnp.sum(
                    y[:, ::67, ::67].astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        int(np.asarray(mb_k(b8, 1)))

        def timed_mb(k):
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                int(np.asarray(mb_k(b8, k)))
                best = min(best, time.perf_counter() - t0)
            return best

        per_frame = chained_slope(timed_mb, 4, 40) / 8
        out_pix = 512 * 512
        out["configs"]["c1_256_gray_2x_microbatch8"] = {
            "ms_per_frame": per_frame * 1e3,
            "out_mpix": out_pix / 1e6,
            "gpix_per_s": out_pix / per_frame / 1e9,
            "note": "8 frames per launch via resize_mxu batch-on-grid "
                    "(serving stream microbatch path)",
        }
        print("c1_256_gray_2x_microbatch8",
              out["configs"]["c1_256_gray_2x_microbatch8"])

    # 3: batch of 64, mixed scales (bucketed: one jit per scale)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(0, 256, (64, 256, 256, 4), np.uint8))

    @jax.jit
    def run_all(b, k):
        # 64 images split into 3 buckets (batched kernel: batch = grid dim);
        # chained k times on device to cancel dispatch overhead.
        def body(i, acc):
            bi = b ^ i.astype(jnp.uint8)
            for s, n in ((2, 22), (3, 21), (4, 21)):
                y = resize_phase_pallas(bi[:n], s, "bicubic", interpret=interp)
                acc = acc + jnp.sum(y[:, ::64, ::64].astype(jnp.int32))
            return acc
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    int(np.asarray(run_all(batch, 1)))  # compile

    def timed(k):
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            int(np.asarray(run_all(batch, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    per_batch = chained_slope(timed, 2, 20)
    total_out_pix = 22 * (512 * 512) + 21 * (768 * 768) + 21 * (1024 * 1024)
    out["configs"]["c3_batch64_mixed"] = {
        "seconds": per_batch,
        "out_mpix": total_out_pix / 1e6,
        "gpix_per_s": total_out_pix / per_batch / 1e9,
        "note": "64 images, 3 scale buckets, batched kernel, chained-K timing",
    }
    print("c3_batch64_mixed", out["configs"]["c3_batch64_mixed"])

    # 6: variable-size stream — mixed frame sizes through ONE compiled
    # bucket program (the serving.Upscaler(bucket=...) path, VERDICT r1
    # weak 3/next 6): per-size plan weights are DATA, indexed by the loop
    # counter on device; frame sizes share the 768x1280 bucket extents.
    from bicubic_interpolation_model_tpu.ops.pallas_phase import (
        _interleave_wrow, _phase_call, _phase_plan_arrays)

    sizes = [(720, 1280), (704, 1238), (768, 1222), (666, 1200)]
    s, c, bucket = 2, 4, 128
    hb = max(-(-h // bucket) * bucket for h, _ in sizes)
    wb = max(-(-w // bucket) * bucket for _, w in sizes)
    step, wstep = 16, 512
    n_i, n_j = -(-hb // step), -(-wb // wstep)
    wrows, wcols = [], []
    taps = left = None
    frames = np.zeros((len(sizes), hb, wb, c), np.uint8)
    for fi, (h, w) in enumerate(sizes):
        wrow_np, wcol_np, taps, left = _phase_plan_arrays(
            "bicubic", h, w, c, s, -0.5, 3, step, wstep, n_i, n_j)
        wrows.append(_interleave_wrow(wrow_np, s, taps))
        wcols.append(wcol_np)
        frames[fi, :h, :w] = rng.integers(0, 256, (h, w, c), np.uint8)
    wrows = jax.device_put(np.stack(wrows))
    wcols = jax.device_put(np.stack(wcols))
    frames = jax.device_put(frames)

    @jax.jit
    def stream_k(frames, wrows, wcols, k):
        n = frames.shape[0]
        def body(i, acc):
            fi = i % n
            x = frames[fi] ^ i.astype(jnp.uint8)
            y = _phase_call(x[None], wrows[fi], wcols[fi], s=s, step=step,
                            wstep=wstep, taps=taps, left=left,
                            interpret=interp)
            return acc + jnp.sum(y[:, ::64, ::64].astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    int(np.asarray(stream_k(frames, wrows, wcols, 1)))  # compile

    def timed6(k):
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            int(np.asarray(stream_k(frames, wrows, wcols, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    per_frame = chained_slope(timed6, 4, 48)
    avg_out_pix = np.mean([h * s * w * s for h, w in sizes])
    out["configs"]["c6_mixed_size_stream"] = {
        "sizes": [f"{h}x{w}" for h, w in sizes],
        "scale": s,
        "ms_per_frame": per_frame * 1e3,
        "fps": 1.0 / per_frame,
        "gpix_per_s": avg_out_pix / per_frame / 1e9,
        "note": "4 frame sizes, one compiled bucket program (768x1280), "
                "per-size clamp-exact weights as data",
    }
    print("c6_mixed_size_stream", out["configs"]["c6_mixed_size_stream"])

    res = pathlib.Path(__file__).resolve().parents[1] / "results"
    res.mkdir(exist_ok=True)
    (res / "bench_configs.json").write_text(json.dumps(out, indent=2))
    print(f"→ {res / 'bench_configs.json'}")


if __name__ == "__main__":
    main()
