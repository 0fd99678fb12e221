#!/usr/bin/env python3
"""Stage-level lab for the packed learned path (VERDICT r2 item 5: ≤6 ms at
the 0020 geometry). Measures, with the chained-K methodology:

  full_xla / full_pallas   — e2e _super_resolve_packed, both tails
  upstream                 — conv_in/res + packed upsample+att + concat
                             (everything that produces the merged map)
  tail_xla / tail_pallas   — the tail alone on a fixed merged map
  f32 variants             — the same without bf16 model stages

Run on the TPU from /root/repo. Writes the stage table to
results/packed_tail_lab.json; the headline learned row is published by
scripts/method_throughput.py --only learned.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

LR_H, LR_W = 348, 510


def chained(fn, x, k_lo=3, k_hi=15, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, k):
        def body(i, acc):
            xi = x ^ i.astype(x.dtype) if x.dtype == jnp.uint8 \
                else x + i.astype(x.dtype) * 1e-6
            y = fn(xi)
            return acc + jnp.sum(y[..., ::64, ::64].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(np.asarray(run(x, 1)))

    def timed(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(x, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    from bicubic_interpolation_model_tpu.bench.suite import chained_slope
    return chained_slope(timed, k_lo, k_hi)


def _probe_tail(pt, m, lr_f32, kout, bout, *, mode, interpret,
                step=16, wstep=128):
    """The packed-tail kernel with stages disabled back to front — same
    grid, block specs, pads and matmul structure as the shipped kernel
    (ops/pallas_packed_tail._tail_kernel), so consecutive deltas apportion
    honestly. mode: matmul < tanh < relayout < apply < full (cumulative)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if mode == "full":
        return pt.packed_tail_pallas(m, lr_f32, kout, bout, scale=4,
                                     step=step, wstep=wstep,
                                     interpret=interpret)
    s = 4
    c = lr_f32.shape[-1]
    twof = m.shape[-1]
    h, w = m.shape[0], m.shape[1]

    def kernel(kb_ref, bias_ref, ma, mb, mc, md, la, lb, lc, ld_, out_ref):
        kdim, ndim = s * twof, s * 16
        top = jnp.concatenate([ma[...], mb[..., :2, :]], axis=1)
        bot = jnp.concatenate([mc[:2], md[:2, :2, :]], axis=1)
        win = jnp.concatenate([top, bot], axis=0)
        base = win[:, 1:1 + wstep]
        lane = jax.lax.broadcasted_iota(jnp.int32, base.shape, 2) % kdim
        win_dx = {0: base,
                  1: jnp.where(lane < twof, win[:, 2:2 + wstep], base),
                  -1: jnp.where(lane >= kdim - twof, win[:, :wstep], base)}
        ltop = jnp.concatenate([la[...], lb[..., :3]], axis=2)
        lbot = jnp.concatenate([lc[:, :3], ld_[:, :3, :3]], axis=2)
        lwin = jnp.concatenate([ltop, lbot], axis=1)
        taps = [[lwin[ch, ty:ty + step, tx:tx + wstep] for ty in range(4)
                 for tx in range(4)] for ch in range(c)]
        bias = bias_ref[0]
        planes = []
        for pp in range(s):
            acc = None
            for dy in (-1, 0, 1):
                p2, sy = (pp + dy) % s, (pp + dy) // s
                for dx in (-1, 0, 1):
                    k = ((dy + 1) * 3 + dx + 1) * kdim
                    a = win_dx[dx][1 + sy:1 + sy + step, :,
                                   p2 * kdim:(p2 + 1) * kdim]
                    a2 = a.reshape(step * wstep, kdim)
                    t = jax.lax.dot(a2, kb_ref[k:k + kdim, :],
                                    precision=None,
                                    preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            if mode == "matmul":
                wts = (acc + bias).astype(jnp.float32)
            else:
                wts = jnp.tanh((acc + bias).astype(jnp.float32))
            if mode in ("matmul", "tanh"):
                # no relayout: lane-reduce + reshape (both layout-natural)
                csum = wts.sum(axis=1).reshape(step, wstep)
                planes.append([csum] * s)
                continue
            wp = jnp.transpose(wts).reshape(ndim, step, wstep)
            if mode == "relayout":
                row = []
                for q in range(s):
                    g = None
                    for i in range(16):
                        v = wp[q * 16 + i]
                        g = v if g is None else g + v
                    row.append(g)
                planes.append(row)
                continue
            row = []                                     # mode == "apply"
            for q in range(s):
                accs = [None] * c
                for i in range(16):
                    wplane = wp[q * 16 + i]
                    for ch in range(c):
                        t = wplane * taps[ch][i]
                        accs[ch] = t if accs[ch] is None else accs[ch] + t
                row.append(jnp.clip(jnp.round(accs[0]).astype(jnp.int32),
                                    0, 255).astype(jnp.float32))
            planes.append(row)
        for q in range(s):
            # route the final cast through i32: Mosaic cannot lower a
            # direct f32 -> u32 convert on TPU (the shipped kernel packs
            # from i32 too, ops/pallas_packed_tail.py:130-134)
            out_ref[q] = jnp.stack(
                [planes[pp][q] for pp in range(s)],
                axis=1).reshape(step * s, wstep).astype(
                    jnp.int32).astype(jnp.uint32)

    mf = m.reshape(h, w, s * s * twof)
    n_i = pt._round_up(h, step) // step
    n_j = pt._round_up(w, wstep) // wstep
    mp = jnp.pad(mf, ((1, (n_i + 1) * step - h - 1),
                      (1, (n_j + 1) * wstep - w - 1), (0, 0)))
    lp = jnp.pad(jnp.transpose(lr_f32, (2, 0, 1)),
                 ((0, 0), (1, (n_i + 1) * step - lr_f32.shape[0] - 1),
                  (1, (n_j + 1) * wstep - w - 1)), mode="edge")
    kb = pt._block_kernels(kout, s, twof).astype(m.dtype)
    bias = jnp.tile(bout.astype(jnp.float32), (s,))[None]
    feat = s * s * twof
    m_spec = lambda di, dj: pl.BlockSpec(
        (step, wstep, feat), lambda i, j, di=di, dj=dj: (i + di, j + dj, 0),
        memory_space=pltpu.VMEM)
    l_spec = lambda di, dj: pl.BlockSpec(
        (c, step, wstep), lambda i, j, di=di, dj=dj: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((9 * s * twof, s * 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s * 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            m_spec(0, 0), m_spec(0, 1), m_spec(1, 0), m_spec(1, 1),
            l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
        ],
        out_specs=pl.BlockSpec((s, step * s, wstep), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, n_i * step * s, n_j * wstep), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(kb, bias, mp, mp, mp, mp, lp, lp, lp, lp)


def main():
    import jax
    import jax.numpy as jnp

    from bicubic_interpolation_model_tpu.evaluation.model_analysis import (
        _load_model_any)
    from bicubic_interpolation_model_tpu.models import inference as inf
    from bicubic_interpolation_model_tpu.ops.pallas_packed_tail import (
        packed_tail_pallas)

    root = pathlib.Path(__file__).resolve().parents[1]
    model, params = _load_model_any(root / "model" / "wp-1e-3-120")
    p = params["params"] if "params" in params else params
    rng = np.random.default_rng(0)
    lr = jax.device_put(rng.integers(0, 256, (LR_H, LR_W, 4), np.uint8))
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()}  geometry {LR_H}x{LR_W}->4x")

    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_program_output)

    rows = {}

    import json
    res = root / "results"
    res.mkdir(exist_ok=True)

    def flush():
        # write after every section: a crash (VMEM OOM, a remote-compile
        # 500 from the tunnel) in a late section must not discard
        # completed measurements (lost the whole round-5 first run)
        out = {"backend": jax.default_backend(),
               "geometry": f"{LR_H}x{LR_W}->4x",
               "checkpoint": "wp-1e-3-120",
               "unit": "ms_per_frame",
               "rows": rows}
        (res / "packed_tail_lab.json").write_text(json.dumps(out, indent=2))
    for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for tail in ("xla", "pallas"):
            fn = lambda x, dt=dt, tail=tail: inf._super_resolve_packed(
                params, x, 4, "train", dtype=dt, tail=tail)
            per = chained(fn, lr)
            rows[f"full_{tail}_{dname}"] = per * 1e3
            # the honest serving-boundary number: whole u8 HWC output
            # materialized per program (round-3 weak #2 — the 9.96 ms
            # chained vs 15.5 ms program-output discrepancy is settled by
            # publishing BOTH under their method names)
            po = bench_program_output(fn, lr)
            rows[f"full_{tail}_{dname}_program_output"] = po * 1e3
            print(f"full_{tail}_{dname}: {per * 1e3:.2f} ms chained / "
                  f"{po * 1e3:.2f} ms program-output", flush=True)
            flush()

    # upstream only: everything that produces the merged map
    def upstream(lr_u8, dt):
        pc, _ = inf._cast_compute(p, jnp.zeros((), jnp.float32), dt)
        xf = ((lr_u8.astype(jnp.float32) / 255.0).astype(dt))[None]

        def conv(x, kp):
            return jax.lax.conv_general_dilated(
                x, kp["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + kp["bias"]

        y = jax.nn.relu(conv(xf, pc["conv_in"]))
        y = y + conv(y, pc["conv_res"])
        return inf._packed_merged_map(pc, y, 4, "train")

    # upstream ends in a POINTWISE einsum — a strided checksum would let
    # XLA elide all unsampled phase columns (PERF_NOTES "checksum
    # fusion"), so this row is program-output timed (includes ~one
    # dispatch of overhead; it exists to apportion, not to publish)
    for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        per = bench_program_output(
            lambda x, dt=dt: upstream(x, dt), lr)
        rows[f"upstream_{dname}"] = per * 1e3
        print(f"upstream_{dname}: {per * 1e3:.2f} ms", flush=True)
        flush()

    # upstream stage attribution (round-4: with the fused tail landed the
    # upstream IS the floor — find out which stage): each prefix is
    # program-output timed; consecutive deltas apportion. Outputs grow
    # along the chain (y 23 MB bf16 → upa 91 MB → merged 181 MB), so each
    # delta includes its extra output materialization (~0.1-0.25 ms).
    def prefix(lr_u8, dt, upto):
        pc, _ = inf._cast_compute(p, jnp.zeros((), jnp.float32), dt)
        xf = ((lr_u8.astype(jnp.float32) / 255.0).astype(dt))[None]

        def conv(x, kp):
            return jax.lax.conv_general_dilated(
                x, kp["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + kp["bias"]

        y = jax.nn.relu(conv(xf, pc["conv_in"]))
        if upto == "conv_in":
            return y
        y = y + conv(y, pc["conv_res"])
        if upto == "convs":
            return y
        # flat-matmul merged-map stages, built from the SAME matrices
        # inference actually runs (inference._merged_map_mats — ADVICE r4:
        # a re-inlined copy here can silently drift from the shipped
        # formulation); only the stage-cut logic is local
        s = 4
        kflat, bias, amat, abias = inf._merged_map_mats(pc, s, "train")
        nw = pc["upsample"]["kernel"].shape[2]
        m_pre = jnp.einsum("nyxi,ij->nyxj", y, kflat.astype(y.dtype)) \
            + bias.astype(y.dtype)
        if upto == "upsample":
            return m_pre
        att = jax.nn.sigmoid(jnp.einsum("nyxj,jk->nyxk", m_pre, amat)
                             + abias)
        lane_is_up = (jnp.arange(s * s * 2 * nw) % (2 * nw)) < nw
        gate = jnp.where(lane_is_up, jnp.repeat(att, 2 * nw, axis=-1),
                         jnp.ones((), att.dtype))
        if upto == "att":
            return m_pre * gate
        raise ValueError(upto)

    for dname, dt in (("bf16", jnp.bfloat16),):
        for upto in ("conv_in", "convs", "upsample", "att"):
            per = bench_program_output(
                lambda x, dt=dt, u=upto: prefix(x, dt, u), lr)
            rows[f"upstream_to_{upto}_{dname}"] = per * 1e3
            print(f"upstream_to_{upto}_{dname}: {per * 1e3:.2f} ms",
                  flush=True)
            flush()

    # tail only, on a fixed merged map
    for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        pc, _ = inf._cast_compute(p, jnp.zeros((), jnp.float32), dt)
        m = jax.block_until_ready(
            jax.jit(lambda x: upstream(x, dt))(lr))
        lrf = lr.astype(jnp.float32)
        kout = jnp.asarray(pc["conv_out"]["kernel"])
        bout = jnp.asarray(pc["conv_out"]["bias"])

        per = chained(lambda mm: packed_tail_pallas(
            mm[0], lrf, kout, bout, scale=4,
            interpret=not on_tpu), m)
        rows[f"tail_pallas_{dname}"] = per * 1e3
        print(f"tail_pallas_{dname}: {per * 1e3:.2f} ms", flush=True)
        flush()

        def xla_tail(mm):
            mp = jnp.pad(mm, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0),
                              (0, 0)))
            lr_pad = jnp.pad(lrf, ((1, 2), (1, 2), (0, 0)), mode="edge")
            chw = jnp.transpose(lr_pad, (2, 0, 1))
            out = inf._packed_phase_tail(mp, chw, kout, bout, 4, 4,
                                         LR_H, LR_W)
            from bicubic_interpolation_model_tpu.ops.learned import (
                _apply_round)
            return _apply_round(out).astype(jnp.uint8)

        per = chained(xla_tail, m)
        rows[f"tail_xla_{dname}"] = per * 1e3
        print(f"tail_xla_{dname}: {per * 1e3:.2f} ms", flush=True)
        flush()

    # ---- kernel anatomy (round 4): tile-shape sweep + stripped probe ----
    # tail_pallas_bf16 ≈ tail_pallas_f32 already says the MXU dots are not
    # the bound; what remains is VPU/layout work (tanh, the per-phase
    # [M, 64] -> [64, step, wstep] relayout, 256 apply FMAs, u32 pack).
    # The sweep finds the best tiling; the stripped probe (same tiling and
    # block specs, stages disabled back to front) apportions the cost.
    pc, _ = inf._cast_compute(p, jnp.zeros((), jnp.float32), jnp.bfloat16)
    m = jax.block_until_ready(
        jax.jit(lambda x: upstream(x, jnp.bfloat16))(lr))
    lrf = lr.astype(jnp.float32)
    kout = jnp.asarray(pc["conv_out"]["kernel"])
    bout = jnp.asarray(pc["conv_out"]["bias"])
    sweep = {}
    for tstep, twstep in ((8, 128), (16, 128), (32, 128), (8, 256),
                          (16, 256), (32, 256), (8, 512), (16, 512)):
        try:
            per = chained(lambda mm, a=tstep, b=twstep: packed_tail_pallas(
                mm[0], lrf, kout, bout, scale=4, step=a, wstep=b,
                interpret=not on_tpu), m)
            sweep[f"step{tstep}_wstep{twstep}"] = per * 1e3
            print(f"tail_pallas_bf16 step{tstep} wstep{twstep}: "
                  f"{per * 1e3:.2f} ms", flush=True)
        except Exception as e:
            sweep[f"step{tstep}_wstep{twstep}"] = f"{type(e).__name__}"
            print(f"tail step{tstep} wstep{twstep}: {type(e).__name__}: "
                  f"{e}", flush=True)
    rows["tail_tile_sweep"] = sweep
    flush()

    from bicubic_interpolation_model_tpu.ops import pallas_packed_tail as pt
    for mode in ("matmul", "tanh", "relayout", "apply", "full"):
        try:
            per = chained(lambda mm, md=mode: _probe_tail(
                pt, mm[0], lrf, kout, bout, mode=md,
                interpret=not on_tpu), m)
        except Exception as e:
            rows[f"tail_probe_{mode}"] = f"{type(e).__name__}"
            print(f"tail_probe_{mode}: {type(e).__name__}: {e}", flush=True)
            continue
        rows[f"tail_probe_{mode}"] = per * 1e3
        print(f"tail_probe_{mode}: {per * 1e3:.2f} ms", flush=True)
    flush()

    print("\nsummary (ms):")
    for k, v in rows.items():
        if isinstance(v, dict):
            continue
        print(f"  {k:>22}: {v:8.2f}")

    flush()
    print("wrote results/packed_tail_lab.json")


if __name__ == "__main__":
    main()
