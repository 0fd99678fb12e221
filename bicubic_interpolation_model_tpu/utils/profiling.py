"""Tracing / profiling / debugging utilities.

The reference's observability is the perf CSV harness plus ad-hoc
console.time (SURVEY.md §5); the TPU-native equivalents here:

- :func:`trace` — context manager around ``jax.profiler`` (view in
  TensorBoard / Perfetto);
- :func:`device_memory_stats` — per-device HBM usage;
- :func:`debug_mode` — enables NaN debugging (``jax_debug_nans``) for a scope;
- :func:`checked` — wraps a function with ``checkify`` so in-kernel
  assertions (index bounds, NaN) surface as Python errors.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bim_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append({
            "device": str(d),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = False):
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def checked(fn, *, errors=None):
    """checkify-wrap ``fn``: returns a function that raises on checked errors
    (div-by-zero, NaN, OOB) instead of producing silent garbage."""
    from jax.experimental import checkify

    errors = errors if errors is not None else checkify.user_checks | checkify.nan_checks

    def wrapper(*args, **kwargs):
        err, out = checkify.checkify(fn, errors=errors)(*args, **kwargs)
        err.throw()
        return out

    return wrapper
