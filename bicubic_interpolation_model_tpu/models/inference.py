"""Learned-model SR inference — the ``npm run msr`` flow
(model_super_resolution.js:125-220) as one jit-compiled program:

  offsets (inference convention) → model.predict([img/255, offsets]) →
  apply_weights (16-tap neighborhood sum) → clip/round u8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.learned import (
    _apply_round, _apply_weights_phase, offset_map,
)


def _cast_compute(params, x, dtype):
    """Cast float params + activations to the compute dtype (bf16 on TPU).

    Learned-model outputs carry no LSB-parity obligation (unlike the
    classical kernels) — the gate is PSNR drift < 0.01 dB on the quality
    table (tests/test_models.py::test_bf16_inference_quality_gate), which
    bf16 convs pass while roughly doubling MXU throughput (VERDICT r2
    item 4). f32 remains available via compute_dtype."""
    if dtype == jnp.float32:
        return params, x
    cast = lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a
    return jax.tree.map(cast, params), x.astype(dtype)


def _default_dtype(compute_dtype):
    if compute_dtype is not None:
        return jnp.dtype(compute_dtype)
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


@functools.partial(jax.jit, static_argnames=("model", "scale", "convention"))
def _predict_weights(model, params, lr_f32, scale, convention):
    h, w = lr_f32.shape[:2]
    off = offset_map(h * scale, w * scale, float(scale), convention)
    pred = model.apply(params, lr_f32[None], off[None])
    return pred[0]


def predict_weights(model, params, lr_u8, scale: int = 4,
                    convention: str = "inference"):
    """[H_lr,W_lr,C] uint8 → [H_sr,W_sr,16] predicted weights."""
    lr_f32 = jnp.asarray(lr_u8).astype(jnp.float32) / 255.0
    return _predict_weights(model, params, lr_f32, scale, convention)


@functools.partial(jax.jit, static_argnames=("model", "scale", "convention"))
def _super_resolve_fused(model, params, lr_u8, scale, convention):
    """predict → apply → round as ONE XLA program: the [H_sr, W_sr, 16]
    weight map never round-trips to HBM between two dispatches (VERDICT r1
    weak #4 — it is ~0.5 GB for a 2K frame), and XLA fuses the normalization,
    einsum epilogue and u8 rounding."""
    lr_f32 = lr_u8.astype(jnp.float32)
    h, w = lr_f32.shape[:2]
    off = offset_map(h * scale, w * scale, float(scale), convention)
    weights = model.apply(params, (lr_f32 / 255.0)[None], off[None])[0]
    out = _apply_weights_phase(lr_f32, weights, scale)
    return _apply_round(out).astype(jnp.uint8)


_WP_LAYERS = ("conv_in", "conv_res", "upsample", "conv_att", "conv_off",
              "conv_out")


def _pack_rgba32(u8_hwc):
    """[H, W, 4] uint8 → [H, W] uint32, little-endian channel bytes — the
    zero-cost serving delivery (identical bytes to the HWC frame; hosts
    view with ops.pallas_interleave.rgba32_to_hwc_np). A [H, W, 4] u8
    program output pays a ~2.4 ms default-layout relayout at 0020 SR
    geometry (minor dim 4 → 32x lane padding); the packed word's minor
    dim is W, so it escapes the tax (results/method_throughput.json,
    adaptive hwc vs hwc32 program-output rows)."""
    u = u8_hwc.astype(jnp.uint32)
    return (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
            | (u[..., 3] << 24))


@functools.partial(jax.jit, static_argnames=("scale", "convention",
                                             "dtype", "tail",
                                             "opaque_alpha", "layout"))
def _super_resolve_packed(params, lr_u8, scale, convention,
                          dtype=jnp.float32, tail="auto",
                          opaque_alpha=False, layout="hwc"):
    """The WeightPredictor forward in PHASE-PACKED layout — every tensor
    stays at LR resolution with the S*S output phases packed into channels,
    so elementwise ops and matmuls always see wide minor dims.

    The round-1 path ran the post-upsample layers at SR resolution in NHWC
    with 16-wide channels (an 8x-idle lane dim on TPU): 27.5 ms at 0020
    geometry vs 7.0 ms packed (docs/PERF_NOTES.md round 2, "packed-phase
    learned path"). Three structural moves:

    * the transposed-conv upsample emits [B, h, w, S, S, 16] directly
      (einsum; no SR-resolution pixel-shuffle transpose);
    * ``conv_off`` collapses to a PER-PHASE CONSTANT [S, S, 16]: both
      offset conventions are phase-periodic (dx depends only on x mod S —
      ops/learned._axis_offsets), so the 1x1 conv of the offset map is S*S
      vectors computed once;
    * ``conv_out`` (3x3 at SR resolution) is phase-decomposed: output
      phase (p, q) contracts 9 shifted LR slices of packed phase
      (p+dy mod S, q+dx mod S) with the corresponding kernel taps.

    Numerics: same ops in a different association order — agrees with the
    flax forward to ~2e-3 in tanh-weight space (bf16-pass matmul rounding);
    after apply+round, ≤2 u8 LSB on ~8% of pixels of the real 0020 image
    with PSNR unchanged (33.307 vs 33.302 dB; tested).
    """
    from ..ops.learned import _apply_round

    s = int(scale)
    p = params["params"] if "params" in params else params
    lr_f32 = lr_u8.astype(jnp.float32)
    h, w, _ = lr_u8.shape

    def conv(x, kp):
        return jax.lax.conv_general_dilated(
            x, kp["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + kp["bias"]

    # model stages run in the compute dtype; the weight maps are cast back
    # to f32 before tanh + the 16-tap apply (u8 pixel math stays f32)
    p, _ = _cast_compute(p, lr_f32, dtype)
    xf = ((lr_f32 / 255.0).astype(dtype))[None]
    y = jax.nn.relu(conv(xf, p["conv_in"]))
    y = y + conv(y, p["conv_res"])                        # [1, h, w, F]

    # tail: merged map (upsample+attention+offset) + conv_out (3x3 over
    # packed phases) + tanh + 16-tap apply + round. On TPU the fused
    # Pallas kernel (ops/pallas_packed_tail) computes ALL of it from the
    # conv features in one pass — the S*S-phase merged map (182 MB at 0020
    # geometry) never exists in HBM, and the XLA graph tail would re-read
    # it per (phase, tap) — ~3.3 GB. tail="xla" forces the graph path
    # (also what the band-sharded path uses); "pallas" forces the kernel
    # (interpreted off-TPU, for tests).
    from ..ops.pallas_packed_tail import (packed_tail_fused,
                                          packed_tail_supported)
    c = lr_u8.shape[-1]
    nw = p["upsample"]["kernel"].shape[2]
    use_pallas = tail == "pallas" or (
        tail == "auto" and jax.default_backend() == "tpu")
    if use_pallas and packed_tail_supported(s, 2 * nw, c):
        mats = _merged_map_mats(p, s, convention)
        return packed_tail_fused(
            y[0], lr_f32, p["conv_out"]["kernel"], p["conv_out"]["bias"],
            *mats, scale=s, opaque_alpha=opaque_alpha, layout=layout)

    m = _packed_merged_map(p, y, s, convention)           # [1,h,w,S,S,2F]
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))

    # phase-decomposed 3x3 + the 16-tap apply, fused per phase plane
    lr_pad = jnp.pad(lr_f32, ((1, 2), (1, 2), (0, 0)), mode="edge")
    chw = jnp.transpose(lr_pad, (2, 0, 1))                # [C, h+3, w+3]
    out = _packed_phase_tail(mp, chw, p["conv_out"]["kernel"],
                             p["conv_out"]["bias"], s, c,
                             h, w)
    res = _apply_round(out).astype(jnp.uint8)
    return _pack_rgba32(res) if layout == "hwc32" else res


def _packed_off_feat(p, s, convention):
    """The conv_off 1x1 layer collapsed to a per-phase constant [S, S, 16]
    (both offset conventions are periodic in x mod S)."""
    from ..ops.learned import _axis_offsets

    dxq = _axis_offsets(s * s, float(s), convention)[:s]
    dyp = _axis_offsets(s * s, float(s), convention)[:s]
    off_pq = jnp.stack(
        [jnp.broadcast_to(dxq[None, :], (s, s)),
         jnp.broadcast_to(dyp[:, None], (s, s))], axis=-1)
    return off_pq @ p["conv_off"]["kernel"][0, 0] + p["conv_off"]["bias"]


def _packed_upsample_att(p, y):
    """Transposed-conv upsample + attention, packed layout:
    [1, h, w, F] → [1, h, w, S, S, 16].

    Reference formulation (kept as the oracle for
    :func:`_packed_merged_map`, which is what the forward actually runs)."""
    up = jnp.einsum("byxi,pqoi->byxpqo", y, p["upsample"]["kernel"]) \
        + p["upsample"]["bias"]
    att = jax.nn.sigmoid(
        jnp.einsum("byxpqo,oa->byxpqa", up, p["conv_att"]["kernel"][0, 0])
        + p["conv_att"]["bias"])
    return up * att


def _merged_map_mats(p, s, convention):
    """The flat merged-map matrices (see :func:`_packed_merged_map`):
    kflat [F_in, S*S*2F] scattered upsample kernel (offset lanes zero),
    bias [S*S*2F] upsample bias + per-phase offset constant,
    amat [S*S*2F, S*S] block-diagonal attention contraction, abias [1].
    Shared by the XLA formulation and the fused-upstream Pallas tail."""
    ku = p["upsample"]["kernel"]                      # [S, S, nw, F_in]
    nw = ku.shape[2]
    n_in = ku.shape[-1]
    blocks = s * s
    off_feat = _packed_off_feat(p, s, convention)     # [S, S, nw]
    kflat = jnp.concatenate(
        [jnp.transpose(ku, (3, 0, 1, 2)).reshape(n_in, blocks, nw),
         jnp.zeros((n_in, blocks, nw), ku.dtype)],
        axis=-1).reshape(n_in, blocks * 2 * nw)
    bias = jnp.concatenate(
        [jnp.broadcast_to(p["upsample"]["bias"], (blocks, nw)),
         off_feat.reshape(blocks, nw)], axis=-1).reshape(-1)
    a = p["conv_att"]["kernel"][0, 0]                 # [nw, 1]
    col = jnp.concatenate([a[:, 0], jnp.zeros((nw,), a.dtype)])
    amat = jnp.kron(jnp.eye(blocks, dtype=a.dtype), col[:, None])
    return kflat, bias, amat, p["conv_att"]["bias"]


def _packed_merged_map(p, y, s, convention):
    """Upsample + attention + offset concat → the merged packed map
    [1, h, w, S, S, 2F], built with FLAT lane-wide matmuls.

    The einsum formulation (:func:`_packed_upsample_att` + concat) keeps a
    16-wide minor dim through three SR-sized intermediates — 7/8-idle lanes
    on every load/store — and measured ~6 ms of the 7.0 ms upstream at 0020
    geometry (results/packed_tail_lab.json, upstream_to_* rows). Here the
    minor dim is the packed channel axis (S*S*2F = 512):

    * the upsample kernel is scattered into a [F_in, S*S*2F] matrix whose
      offset lanes are zero columns, so ONE [M, F_in] @ [F_in, S*S*2F]
      matmul emits the whole pre-gate map; the per-phase offset constant
      (``conv_off`` collapsed — see `_packed_off_feat`) rides the bias;
    * attention contracts the same flat map against a block-diagonal
      [S*S*2F, S*S] matrix (zero rows on offset lanes);
    * the gate multiplies up-lanes only, via one lane-mask select.

    Numerics: the zero columns contribute exact zeros, but the wider
    contractions chunk their partial sums differently, so the result matches
    the einsum formulation only up to reduction-order rounding — ≤1e-3 in
    tanh-weight space on the up lanes, offset lanes exact (asserted in
    tests/test_models.py::test_packed_merged_map_matches_einsum); end-to-end
    this stays inside the packed path's documented ≤2-LSB envelope
    (test_packed_inference_matches_fused).
    """
    nw = p["upsample"]["kernel"].shape[2]
    blocks = s * s
    kflat, bias, amat, abias = _merged_map_mats(p, s, convention)
    m_pre = jnp.einsum("byxi,ij->byxj", y, kflat.astype(y.dtype)) \
        + bias.astype(y.dtype)                        # [1, h, w, S*S*2F]

    att = jax.nn.sigmoid(jnp.einsum("nyxj,jk->nyxk", m_pre, amat)
                         + abias)                     # [1, h, w, S*S]

    lane_is_up = (jnp.arange(blocks * 2 * nw) % (2 * nw)) < nw
    gate = jnp.where(lane_is_up, jnp.repeat(att, 2 * nw, axis=-1),
                     jnp.ones((), att.dtype))
    m = m_pre * gate
    return m.reshape(y.shape[:3] + (s, s, 2 * nw))


def _packed_phase_tail(mp, chw, kout, bout, s, c, h, w):
    """conv_out (phase-decomposed 3x3 tanh) + the 16-tap apply, per phase
    plane. ``mp`` is the merged packed map with ONE zero row/col of padding
    on each side ([1, h+2, w+2, S, S, 2F]); ``chw`` the planar LR pixels
    with (1 leading, 2 trailing) rows/cols of padding ([C, h+3, w+3]).
    Shared by the single-chip path and the band-sharded path
    (parallel/spatial.learned_resize_spatial_sharded), which build the same
    local window shapes from ppermute halos. Returns float [h*S, w*S, c].
    """
    cols = []
    for pp in range(s):
        planes = []
        for q in range(s):
            acc = None
            for dy in (-1, 0, 1):
                p2, sy = (pp + dy) % s, (pp + dy) // s
                for dx in (-1, 0, 1):
                    q2, sx = (q + dx) % s, (q + dx) // s
                    src = mp[:, 1 + sy:1 + sy + h, 1 + sx:1 + sx + w,
                             p2, q2]
                    t = jnp.einsum("bhwi,io->bhwo", src,
                                   kout[dy + 1, dx + 1])
                    acc = t if acc is None else acc + t
            wts = jnp.tanh((acc + bout).astype(jnp.float32))[0]  # [h,w,16]
            aw = None
            for i in range(16):
                ty, tx = i // 4, i % 4
                tap = chw[:, ty:ty + h, tx:tx + w]        # [C, h, w]
                term = wts[None, :, :, i] * tap
                aw = term if aw is None else aw + term
            planes.append(aw)                             # [C, h, w]
        cols.append(planes)
    grid = jnp.stack([jnp.stack(r, axis=-1) for r in cols], axis=2)
    return grid.transpose(1, 2, 3, 4, 0).reshape(h * s, w * s, c)


def super_resolve(model, params, lr_u8, scale: int = 4,
                  convention: str = "inference", *, exact: bool = False,
                  compute_dtype=None, opaque_alpha: bool = False,
                  layout: str = "hwc"):
    """Full learned SR: uint8 LR in, uint8 SR out, one compiled program.

    ``convention`` defaults to the reference's inference-time offsets
    (model_super_resolution.js:33-55); use "train" for self-consistent
    offsets matching the training data (§2.3 of SURVEY.md documents the
    reference's inconsistency).

    WeightPredictor checkpoints take the phase-packed fast path (~8x on
    TPU, see :func:`_super_resolve_packed`), which deviates ≤2 u8 LSB from
    the canonical fused program (association order; PSNR unchanged), ≤3 LSB
    with the TPU-default bf16 model stages (measured on 0020: max 3, mean
    0.11, PSNR −0.003 dB). ``exact=True`` forces the canonical fused f32
    predict+apply program — the strict-mode escape hatch (VERDICT r2
    weak #3).

    ``compute_dtype`` selects the model-stage matmul/conv dtype: None →
    bfloat16 on TPU, float32 elsewhere (the 16-tap pixel apply always runs
    f32). Measured on-chip: PSNR drift ≤0.003 dB on both WeightPredictor
    checkpoints (passes the <0.01 dB gate), max 2 u8 LSB vs f32
    (docs/PERF_NOTES.md, round-3 bf16 gate table).

    ``layout="hwc32"`` (RGBA frames only) returns the SAME bytes as a
    [H_sr, W_sr] uint32 word array — the serving delivery: a u8 HWC frame
    as a default-layout program output pays a ~2.4 ms relayout at 0020 SR
    geometry, the packed word escapes it. View on host with
    ``ops.pallas_interleave.rgba32_to_hwc_np`` (free byte view).
    """
    lr = jnp.asarray(lr_u8)
    if layout not in ("hwc", "hwc32"):
        raise ValueError(f"layout must be 'hwc' or 'hwc32', got {layout!r}")
    if layout == "hwc32" and lr.shape[-1] != 4:
        raise ValueError("layout='hwc32' packs 4 channel bytes per word; "
                         f"got C={lr.shape[-1]} (RGBA frames only)")
    p = params.get("params", params) if hasattr(params, "get") else params
    if (not exact and type(model).__name__ == "WeightPredictor"
            and all(k in p for k in _WP_LAYERS)):
        # opaque_alpha is EXPLICIT opt-in (ModelUpscaler(opaque_alpha=True)):
        # auto-detecting per call would scan the host frame (O(H*W)) and
        # give batch/stream (device arrays, undetectable) different alpha
        # rounding than per-frame calls — ±1 LSB entry-point skew
        return _super_resolve_packed(params, lr, int(scale), convention,
                                     dtype=_default_dtype(compute_dtype),
                                     opaque_alpha=opaque_alpha,
                                     layout=layout)
    out = _super_resolve_fused(model, params, lr, int(scale), convention)
    return _pack_rgba32(out) if layout == "hwc32" else out


@functools.partial(jax.jit, static_argnames=("model", "dtype"))
def _apply_direct(model, params, x, dtype=jnp.float32):
    params, x = _cast_compute(params, x, dtype)
    return model.apply(params, x).astype(jnp.float32)


def super_resolve_direct(model, params, lr_u8, *, compute_dtype=None):
    """Direct-regression SR models (ESPCN/ESRGAN families): float [0,1]
    in/out.

    ``compute_dtype`` defaults to float32 here (unlike the packed learned
    path): the measured on-chip bf16 gate shows these conv stacks drift
    0.012–0.023 dB on the quality table — outside the <0.01 dB bar — while
    gaining only 6–21%, because their 24–48-channel convs are MXU
    lane-bound, not compute-bound (docs/PERF_NOTES.md round-3 bf16 gate
    table). Pass ``compute_dtype="bfloat16"`` to opt in.

    The model is a static jit argument (flax Modules hash by config), so the
    compiled program is reused across calls — `jax.jit(model.apply)` would
    re-trace every time because bound methods are fresh objects per access."""
    x = jnp.asarray(lr_u8).astype(jnp.float32) / 255.0
    dt = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
    y = _apply_direct(model, params, x[None], dtype=dt)[0]
    return jnp.clip(jnp.floor(y * 255.0 + 0.5), 0, 255).astype(jnp.uint8)


def super_resolve_batch(model, params, lrs_u8, scale: int = 4,
                        convention: str = "inference", *,
                        exact: bool = False, compute_dtype=None,
                        opaque_alpha: bool = False):
    """[B, H, W, C] same-size frames in ONE launch.

    WeightPredictor checkpoints: ``jax.vmap`` lifts the batch onto the
    packed forward — the fused Pallas tail's grid grows a leading batch
    dimension, so small frames amortize per-launch overhead exactly like
    the classical ``Upscaler.batch`` path (ops/pallas_mxu batch-on-grid).
    Direct-regression models are natively batched. Same numerics contracts
    as :func:`super_resolve` / :func:`super_resolve_direct`.
    """
    lrs = jnp.asarray(lrs_u8)
    if lrs.ndim != 4:
        raise ValueError("expected [B, H, W, C] uint8")
    p = params.get("params", params) if hasattr(params, "get") else params
    if type(model).__name__ != "WeightPredictor":
        dt = (jnp.float32 if compute_dtype is None
              else jnp.dtype(compute_dtype))
        x = lrs.astype(jnp.float32) / 255.0
        y = _apply_direct(model, params, x, dtype=dt)
        return jnp.clip(jnp.floor(y * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
    if not exact and all(k in p for k in _WP_LAYERS):
        fn = lambda im: _super_resolve_packed(
            params, im, int(scale), convention,
            dtype=_default_dtype(compute_dtype),
            opaque_alpha=opaque_alpha)
        return jax.vmap(fn)(lrs)
    return jax.vmap(lambda im: _super_resolve_fused(
        model, params, im, int(scale), convention))(lrs)
