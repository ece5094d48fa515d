"""Test configuration: force CPU with a virtual 8-device mesh and fp64.

The multi-device tests emulate an 8-chip TPU slice on CPU (the analog of the
reference's ``mpirun -np N`` single-box testing, SURVEY.md section 4), and the
physics tests run in float64 for tight analytic tolerances.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell profile exports "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the driver tests compile many plane-step
# variants; reruns hit the cache instead of recompiling
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
