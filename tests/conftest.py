"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding tests run on a
virtual 8-device CPU platform (same XLA partitioner/collective semantics).
Must run before the first `import jax` in any test module — pytest imports
conftest.py first, so setting env here is sufficient.
"""

import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # env ships JAX_PLATFORMS=axon (1 real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var; force it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA-CPU compiles of the prover graphs are
# expensive; cache them across test runs.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
