"""Device mesh helpers.

The reference has no parallelism at all (single-threaded Node,
SURVEY.md §2.5); here batch ("data") and band ("spatial") parallelism are
first-class, built on jax.sharding over ICI — no custom transport.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("data", "spatial"),
              spatial: int | None = None) -> Mesh:
    """A (data x spatial) mesh over the first ``n_devices`` devices.

    ``spatial`` defaults to the largest power-of-two ≤ sqrt(n) that divides n
    — e.g. 8 devices → 4x2, 4 → 2x2, 2 → 2x1, 1 → 1x1.
    """
    all_devs = jax.devices()
    if n_devices is not None and len(all_devs) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(all_devs)} "
            f"device(s) are visible (backend {jax.default_backend()!r})")
    devs = all_devs[:n_devices] if n_devices else all_devs
    n = len(devs)
    if spatial is None:
        spatial = 1
        while (spatial * 2) ** 2 <= n and n % (spatial * 2) == 0:
            spatial *= 2
    if n % spatial:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    import numpy as np
    arr = np.asarray(devs).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
