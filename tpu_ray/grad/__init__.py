"""Differentiable rendering: pixel gradients + inverse-rendering training.

The reference has no gradients (SURVEY.md: "no gradients"); this package is
the capability the TPU re-design adds on top of parity. Gradients flow w.r.t.
sphere centers/radii, materials, and camera pose through the O(R) payload
recompute only (see tpu_ray.ops.intersect) — never through the O(R*N)
search — with discrete choices (hit selection, refract-vs-reflect) held
fixed by the counter RNG so the integrand is piecewise smooth (SURVEY.md §7
"Gradients through discreteness").
"""

from tpu_ray.grad.render_grad import (
    image_mse,
    render_mean,
    render_mean_sharded,
)
from tpu_ray.grad.fit import TrainState, make_train_step

__all__ = [
    "image_mse",
    "render_mean",
    "render_mean_sharded",
    "TrainState",
    "make_train_step",
]
