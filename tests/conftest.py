"""Test configuration.

* Requests the CPU platform with 8 virtual devices so sharding tests can
  run without TPU hardware (SURVEY.md §4). Note: under the axon TPU
  plugin the default backend may remain 'tpu'; multi-device tests should
  select devices explicitly via jax.devices('cpu').
* Enables the persistent compilation cache — the solver/U-Net scan
  programs are expensive to compile and identical across test runs.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax  # noqa: E402

jax.config.update('jax_enable_x64', False)
try:
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except AttributeError:
    pass

# Under the axon TPU plugin JAX_PLATFORMS=cpu is not honored; pin the
# default device to CPU explicitly so the suite is hermetic (local
# compiles, no TPU tunnel). TPU-only tests check jax.default_backend().
try:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
except Exception:
    pass
