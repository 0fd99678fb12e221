from .kernels import cubic_keys, lanczos as lanczos_kernel
from .plan import (
    AxisPlan,
    plan_bicubic,
    plan_bilinear,
    plan_lanczos,
    plan_nearest,
    plan_axis,
    plan_to_matrix,
    phase_lut_bicubic,
    interior_band,
)

__all__ = [
    "cubic_keys",
    "lanczos_kernel",
    "AxisPlan",
    "plan_bicubic",
    "plan_bilinear",
    "plan_lanczos",
    "plan_nearest",
    "plan_axis",
    "plan_to_matrix",
    "phase_lut_bicubic",
    "interior_band",
]
