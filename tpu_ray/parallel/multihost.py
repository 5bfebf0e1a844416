"""Multi-host initialization (the WorkQueueCreate analogue across hosts).

The reference spawns worker threads once at startup (WorkQueueCreate,
reference wasm/wasm.cpp:651-666); the multi-host TPU equivalent is
`jax.distributed.initialize` + a mesh spanning every process's local
devices (SURVEY.md §5.8). Single-process (including the 1-chip tunnel and
the virtual CPU platform) needs no initialization — `ensure_initialized`
is a no-op there, so the same entry points run everywhere.

Typical pod-slice usage (same script on every host):

    from tpu_ray.parallel import make_mesh
    from tpu_ray.parallel.multihost import ensure_initialized
    ensure_initialized()                  # no-op off-pod
    mesh = make_mesh()                    # all global devices, "rays" axis
    img, rays = render_pass_sharded(scene, camera, mesh=mesh, ...)

Every collective in tpu_ray.parallel rides ICI within a slice and DCN
across hosts automatically; nothing else is host-aware.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def _already_initialized() -> bool:
    """True iff jax.distributed.initialize has already run.

    Read from the distributed service state directly — anything like
    jax.process_count() would itself initialize the XLA backend, after which
    jax.distributed.initialize raises ("must be called before any JAX calls
    that might initialise the XLA backend").
    """
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        return False


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; else no-op.

    Returns True iff distributed mode is active. Decides from env/args ONLY
    — it must not touch any backend-initializing JAX API (device queries,
    process_count) before jax.distributed.initialize, which requires a
    pristine backend. Explicit args or JAX_COORDINATOR_ADDRESS force
    initialization; a bare single process returns False without any JAX
    call at all.
    """
    if _already_initialized():
        return jax.process_count() > 1
    # explicit opt-in only: pod-env sniffing misfires on single-chip
    # tunnels that still carry TPU_* variables
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1
