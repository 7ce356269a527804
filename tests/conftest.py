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

# Persistent compile cache: the slow tier is dominated by XLA CPU
# compiles of the full train step on the 8-device mesh (41:47 for 4
# tests cold — VERDICT r4). bench.py already uses a persistent cache;
# give the tests one too so warm reruns skip the compile entirely.
# SAMT_TEST_NO_CACHE=1 disables (cold-compile timing measurements).
if os.environ.get("SAMT_TEST_NO_CACHE") != "1":
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/samt_test_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
