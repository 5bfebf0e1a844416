"""Test configuration: force an 8-device virtual CPU platform.

Mirrors the reference's determinism-first test posture (SURVEY.md §4): the
multi-chip sharding code paths (tpu_ray.parallel) are exercised on a virtual
8-device CPU mesh, exactly as they would run on an 8-chip TPU slice.

Note: the env var JAX_PLATFORMS is overridden by the installed TPU plugin in
this environment, so the platform is forced via jax.config instead (which
wins over the plugin's import-time default).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
