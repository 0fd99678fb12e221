"""Multi-host initialization.

The reference has no distributed anything (SURVEY §2.5); here multi-host runs
use jax.distributed over DCN for the input pipeline and ICI collectives for
compute. One call at program start:

    from bicubic_interpolation_model_tpu.parallel import distributed
    distributed.initialize()          # no-op on single-host
    mesh = make_mesh()                # spans all hosts' devices

Process-local batch feeding: shard_host_batch() splits a global batch across
hosts by process index (each host only materializes its slice).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when a multi-host env is detected (or args
    are given). Returns True if distributed mode is active."""
    coordinator = coordinator or os.environ.get("BIM_TPU_COORDINATOR")
    if coordinator is None and num_processes is None:
        return False  # single host (explicit opt-in only)
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    # CPU multi-process needs an explicit cross-process collectives backend
    # (TPU pods get theirs from the platform; the knob must be set before the
    # backend initializes).
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # knob absent or backend already up — fine on single host
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e):
            return True
        raise
    return True


def host_slice(global_batch: int) -> slice:
    """This host's slice of a globally-indexed batch."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_host_batch(make_global, global_batch: int):
    """Materialize only this host's shard of a batch: ``make_global`` is
    called with (start, count) and should return [count, ...] arrays."""
    s = host_slice(global_batch)
    return make_global(s.start, s.stop - s.start)
