"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's absent-but-needed multi-device test strategy
(SURVEY.md section 4): multi-chip sharding is validated on virtual CPU
devices, no cluster required.

Note: this machine's sitecustomize force-registers a TPU PJRT plugin and
overwrites jax_platforms AFTER env vars are read, so plain
JAX_PLATFORMS=cpu is not enough — we override the config post-import,
before any backend initializes.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
# this environment defaults matmuls/convs to reduced precision even on CPU;
# parity tests compare against torch float32, so pin highest precision here
# (library code keeps the default so TPU runs use the fast MXU paths)
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
