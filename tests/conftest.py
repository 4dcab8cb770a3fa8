"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not depend on TPU hardware; multi-chip sharding is validated on
XLA's host-platform device simulation (see SURVEY.md §4).  NB: the axon
environment pre-imports jax via sitecustomize, so env vars alone are too
late -- use the runtime config API.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')
# persistent compilation cache: repeated test runs skip XLA recompiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax-dumphfdl-tests')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
