"""Host-side utilities: image IO, checkpointing, metrics, profiling.

The TPU-native replacement for the reference's platform/UI layer (SURVEY.md
§2 C20): where the reference blits to WebGL and pokes DOM stat spans
(reference wasm/wasm.cpp:96-218), this framework writes PNGs, JSONL metrics,
and resumable checkpoints.
"""

from tpu_ray.utils.png import write_png
from tpu_ray.utils.checkpoint import load_checkpoint, save_checkpoint
from tpu_ray.utils.metrics import MetricsLogger, StepTimer

__all__ = [
    "write_png",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "StepTimer",
]
