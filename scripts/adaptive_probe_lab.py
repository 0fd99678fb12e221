#!/usr/bin/env python3
"""Adaptive-kernel ceiling probe (VERDICT r3 item 4).

Round 3 closed its adaptive work with an ASSERTED ceiling: "the irreducible
16-tap FMA core is ~1.4 ms at the VPU's issue rate and the measured kernel
runs at ~50% of that rate — the rest is Mosaic scheduling". This lab tests
that claim directly: stripped variants of the vA3 kernel with IDENTICAL
tiling, block specs, scratch allocation and epilogue, but with the law math
replaced by constants, measure what the 16-tap FMA core + normalize + pack
+ sublane-stack structure can actually sustain on this chip.

Variants (1080p→4x RGBA, planar output, chained-K methodology):

  full         the shipped vA3 kernel (baseline, ops/pallas_adaptive)
  law_scratch  phase A writes constant maps to the VMEM scratch, phase B
               unchanged — isolates the LAW ALU cost (edge/flat/texture
               laws + |Δluma| + exp) from everything else
  law_const    phase A deleted, f = 1.0 tile constant, eq/g2 term kept —
               additionally removes the scratch write+read traffic
  fma_only     f = 1.0 and the g2/eq term dropped: the pure
               16-tap (wy·wx outer-product weight, FMA into c+1 accs)
               core + reciprocal normalize + u32 pack + sublane stack

If fma_only ≈ the 1.4 ms cost-model floor, the round-3 "Mosaic scheduling"
attribution was wrong and the law/scratch deltas show where the real time
goes; if fma_only ≈ the measured full-kernel time minus the law delta, the
ceiling is proven with data. Writes results/adaptive_probe.json.
"""

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bicubic_interpolation_model_tpu.ops import pallas_adaptive as pa
    from bicubic_interpolation_model_tpu.ops.pallas_resize import _round_up

    S, A = 4, -0.5
    H, W, C = 1080, 1920, 4
    STEP, WSTEP = 16, 512
    _LEFT, _HALO = pa._LEFT, pa._HALO

    def probe_kernel(wy_ref, wye_ref, wx_ref, xa, xb, xc, xd,
                     la, lb, lc, ld_, out_ref, fs_ref, *,
                     scale, step, wstep, c, mode):
        s = scale
        n_cy = 2

        def window(a_ref, b_ref, c_ref, d_ref, lead):
            top = jnp.concatenate([a_ref[lead], b_ref[lead][:, :_HALO]],
                                  axis=1)
            bot = jnp.concatenate([c_ref[lead][:_HALO],
                                   d_ref[lead][:_HALO, :_HALO]], axis=1)
            return jnp.concatenate([top, bot], axis=0)

        if mode == "law_scratch":
            lwin = window(la, lb, lc, ld_, 0)
            base = lwin[2:2 + step, 2:2 + wstep]
            for m in range(4):
                for n in range(4):
                    for cx in range(2):
                        for k in range(2):
                            # cheapest possible phase A: constant map with
                            # one mul+add (the full kernel's laws cost ~10
                            # ops + an exp per map)
                            fs_ref[((cx * 4 + n) * 4 + m) * n_cy + k] = \
                                base * 0.0 + 1.0

        xwins = [window(xa, xb, xc, xd, ch).astype(jnp.int32)
                 .astype(jnp.float32) for ch in range(c)]
        ones = None

        for px in range(s):
            cx = 1 if px / s >= 0.5 else 0
            qplanes = []
            for q in range(s):
                kcy = 1 if q / s >= 0.5 else 0
                wsum = None
                accs = [None] * c
                for m in range(4):
                    xcols = [xwins[ch][:, m + 1:m + 1 + wstep]
                             for ch in range(c)]
                    wxv = wx_ref[px * 4 + m:px * 4 + m + 1, :]
                    wxev = wx_ref[(s + px) * 4 + m:(s + px) * 4 + m + 1, :]
                    for n in range(4):
                        wyv = wy_ref[:, q * 4 + n][:, None]
                        if mode == "law_scratch":
                            f = fs_ref[((cx * 4 + n) * 4 + m) * n_cy + kcy]
                        elif mode == "law_const":
                            if ones is None:
                                ones = xcols[0][1:1 + step] * 0.0 + 1.0
                            f = ones
                        else:                          # fma_only
                            f = None
                        if f is None:
                            wgt = wyv * wxv
                        else:
                            g1 = wyv * f
                            wyev = wye_ref[:, q * 4 + n][:, None]
                            g2 = wyev - wyev * f
                            wgt = g1 * wxv + g2 * wxev
                        wsum = wgt if wsum is None else wsum + wgt
                        for ch in range(c):
                            tap = xcols[ch][n + 1:n + 1 + step]
                            t = wgt * tap
                            accs[ch] = t if accs[ch] is None \
                                else accs[ch] + t
                rec = 1.0 / wsum
                packed = None
                for ch in range(c):
                    v = jnp.clip((accs[ch] * rec + 0.5).astype(jnp.int32),
                                 0, 255).astype(jnp.uint32)
                    word = v if ch == 0 else (v << (8 * ch))
                    packed = word if packed is None else packed | word
                qplanes.append(packed)
            out_ref[px] = jnp.stack(qplanes, axis=1).reshape(step * s, wstep)

    def probe_dispatch(xp, lp, wy, wye, wx, *, mode, n_i, n_j):
        kernel = functools.partial(probe_kernel, scale=S, step=STEP,
                                   wstep=WSTEP, c=C, mode=mode)
        x_spec = lambda di, dj: pl.BlockSpec(
            (C, STEP, WSTEP), lambda i, j: (0, i + di, j + dj),
            memory_space=pltpu.VMEM)
        l_spec = lambda di, dj: pl.BlockSpec(
            (1, STEP, WSTEP), lambda i, j: (0, i + di, j + dj),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((STEP, S * 4), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((STEP, S * 4), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * S * 4, WSTEP), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                x_spec(0, 0), x_spec(0, 1), x_spec(1, 0), x_spec(1, 1),
                l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
            ],
            out_specs=pl.BlockSpec((S, STEP * S, WSTEP),
                                   lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (S, n_i * STEP * S, n_j * WSTEP), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((16 * 2 * 2, STEP, WSTEP), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(wy, wye, wx, xp, xp, xp, xp, lp, lp, lp, lp)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def probe(img, mode):
        h, w, c = img.shape
        n_i = _round_up(h, STEP) // STEP
        n_j = _round_up(w, WSTEP) // WSTEP
        wy_np, wye_np = pa.row_vectors(h, S, A, n_i * STEP)
        wy, wye = jnp.asarray(wy_np), jnp.asarray(wye_np)
        wx = jnp.asarray(pa.col_vectors(w, S, A, n_j * WSTEP))
        xf = img.astype(jnp.float32)
        luma = (xf[..., 0] * 0.2126 + xf[..., 1] * 0.7152
                + xf[..., 2] * 0.0722)
        xp = jnp.pad(jnp.transpose(img, (2, 0, 1)),
                     ((0, 0), (_LEFT, (n_i + 1) * STEP - h - _LEFT),
                      (_LEFT, (n_j + 1) * WSTEP - w - _LEFT)), mode="edge")
        lp = jnp.pad(luma, ((_LEFT, (n_i + 1) * STEP - h - _LEFT),
                            (_LEFT, (n_j + 1) * WSTEP - w - _LEFT)),
                     mode="edge")[None]
        return probe_dispatch(xp, lp, wy, wye, wx, mode=mode,
                              n_i=n_i, n_j=n_j)

    def chained(fn, img):
        # the SAME shared chained-K implementation method_throughput.py
        # uses — the two adaptive rows must be methodology-identical
        from bicubic_interpolation_model_tpu.bench.suite import chained_bench
        return chained_bench(fn, img)

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (H, W, C), np.uint8))
    out_pix = H * W * S * S

    rows = {}
    per = chained(lambda x: pa.adaptive_resize_pallas(
        x, S, A, layout="planar"), img)
    rows["full"] = {"ms_per_frame": per * 1e3,
                    "gpix_per_s": out_pix / per / 1e9}
    print("full", rows["full"])

    for mode in ("law_scratch", "law_const", "fma_only"):
        per = chained(lambda x, m=mode: probe(x, m), img)
        rows[mode] = {"ms_per_frame": per * 1e3,
                      "gpix_per_s": out_pix / per / 1e9}
        print(mode, rows[mode])

    full = rows["full"]["ms_per_frame"]
    rows["attribution_ms"] = {
        "law_alu": full - rows["law_scratch"]["ms_per_frame"],
        "scratch_traffic": rows["law_scratch"]["ms_per_frame"]
        - rows["law_const"]["ms_per_frame"],
        "eq_term": rows["law_const"]["ms_per_frame"]
        - rows["fma_only"]["ms_per_frame"],
        "fma_core_plus_epilogue": rows["fma_only"]["ms_per_frame"],
    }
    print("attribution", rows["attribution_ms"])

    root = pathlib.Path(__file__).resolve().parents[1]
    res = root / "results"
    res.mkdir(exist_ok=True)
    import datetime
    import subprocess
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            cwd=root, capture_output=True,
                            text=True).stdout.strip()
    out = {"backend": jax.default_backend(),
           "geometry": "1080p->4x planar", "unit": "ms_per_frame",
           "tile": f"step{STEP}_wstep{WSTEP}", "rows": rows,
           "_provenance": {"backend": jax.default_backend(),
                           "device": str(jax.devices()[0]),
                           "jax": jax.__version__, "commit": commit,
                           "date": datetime.datetime.now(
                               datetime.timezone.utc)
                           .strftime("%Y-%m-%dT%H:%M:%SZ")}}
    (res / "adaptive_probe.json").write_text(json.dumps(out, indent=2))
    print("wrote results/adaptive_probe.json")


if __name__ == "__main__":
    main()
