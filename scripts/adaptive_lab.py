#!/usr/bin/env python3
"""Adaptive-kernel lab: the measurement harness behind the vA1→vA3 redesign
(docs/PERF_NOTES.md "adaptive-bicubic fused kernel").

Modes:
  sweep            tile-parameter sweep of the SHIPPED kernel (planar + hwc)
  ablate           component ablations on a copy of the shipped kernel body:
                     nolaw  — modulation law replaced by one subtract
                     noeq   — positional-exemption (G2) term dropped
                   (both break parity; they exist to attribute time)
  progout          default-layout program-output timing (the honest layout-
                   boundary cost; see PERF_NOTES "checksum fusion")

History (all measured on one v5e chip, 1080p→4x planar unless noted):
  vA1  interleaved-row body, 10 live accs       13.6 ms hwc / 2.0 GPix/s pl
  vA2  scratch G-maps at output-row res          2.4 GPix/s
  fsE  raw F at LR res, expand in B             17.6 ms (repeats, not
                                                 traffic, were the cost)
  vA3  S^2 LR-resolution phase planes, 0 reps    6.4 GPix/s (shipped)
Ablations on vA2 showed laws ~1 ms and eq ~0.5 ms of 13.6 — the repeats
were the bottleneck, which is what vA3 removes.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def _chained(fn, img, k_lo=2, k_hi=10, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ch(img, k):
        def body(i, acc):
            y = fn(img ^ i.astype(img.dtype))
            return acc + jnp.sum(y[..., ::64, ::64].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(np.asarray(ch(img, 1)))

    def t(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(ch(img, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(k_hi) - t(k_lo)) / (k_hi - k_lo), 1e-9)


def cmd_sweep(args):
    import jax

    from bicubic_interpolation_model_tpu.ops.pallas_adaptive import (
        adaptive_resize_pallas)

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (args.h, args.w, 4), np.uint8))
    out_pix = args.h * args.w * args.scale ** 2
    for step, wstep, layout in [(8, 256, "planar"), (16, 256, "planar"),
                                (16, 512, "planar"), (32, 256, "planar"),
                                (16, 512, "hwc")]:
        try:
            per = _chained(lambda x: adaptive_resize_pallas(
                x, args.scale, -0.5, step=step, wstep=wstep,
                layout=layout), img)
            print(f"step={step:3d} wstep={wstep:4d} {layout:6s}: "
                  f"{per * 1e3:7.2f} ms  {out_pix / per / 1e9:6.2f} GPix/s")
        except Exception as e:  # Mosaic tile limits → compile 500s
            print(f"step={step:3d} wstep={wstep:4d} {layout:6s}: "
                  f"FAIL {type(e).__name__}")


def cmd_ablate(args):
    import jax

    import bicubic_interpolation_model_tpu.ops.pallas_adaptive as pa

    src_path = pathlib.Path(pa.__file__)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (args.h, args.w, 4), np.uint8))

    def load_variant(transform):
        src = src_path.read_text()
        src = src.replace(
            "from .adaptive import _cubic_memo_np",
            "from bicubic_interpolation_model_tpu.ops.adaptive import "
            "_cubic_memo_np")
        src = src.replace(
            "from .pallas_resize import _round_up",
            "from bicubic_interpolation_model_tpu.ops.pallas_resize import "
            "_round_up")
        src = transform(src)
        ns = {"__name__": f"pallas_adaptive_ablate"}
        exec(compile(src, ns["__name__"], "exec"), ns)
        return ns["adaptive_resize_pallas"]

    variants = {
        "base": lambda s: s,
        # law → one subtract (breaks parity; attributes law time)
        "nolaw": lambda s: s.replace(
            """ldm = jnp.abs(cl - tl)
                    edge_f = jnp.minimum(1.5, 1.0 + ldm * 0.01)
                    flat_f = jnp.maximum(0.5, 1.0 - ldm * (1.0 / 30.0))
                    text_f = 0.8 + 0.4 * jnp.exp(ldm * (-1.0 / 20.0))
                    f = jnp.where(edm, edge_f,
                                  jnp.where(flm, flat_f, text_f))""",
            "f = cl - tl"),
        # exemption term dropped (breaks parity; attributes eq time)
        "noeq": lambda s: s.replace(
            """g1 = wyv * f
                    g2 = wyev - wyev * f
                    wgt = g1 * wxv + g2 * wxev""",
            "wgt = (wyv * f) * wxv"),
    }
    out_pix = args.h * args.w * args.scale ** 2
    for name, tf in variants.items():
        fn = load_variant(tf)
        per = _chained(lambda x: fn(x, args.scale, -0.5, layout="planar"),
                       img)
        print(f"{name:6s}: {per * 1e3:7.2f} ms  "
              f"{out_pix / per / 1e9:6.2f} GPix/s")


def cmd_progout(args):
    import jax

    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_program_output)
    from bicubic_interpolation_model_tpu.ops.pallas_adaptive import (
        adaptive_resize_pallas)

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (args.h, args.w, 4), np.uint8))
    for layout in ("planar", "hwc"):
        per = bench_program_output(
            lambda x: adaptive_resize_pallas(x, args.scale, -0.5,
                                             layout=layout), img)
        print(f"{layout:6s} program-output: {per * 1e3:7.2f} ms/frame")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["sweep", "ablate", "progout"])
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()
    {"sweep": cmd_sweep, "ablate": cmd_ablate, "progout": cmd_progout}[
        args.mode](args)


if __name__ == "__main__":
    main()
