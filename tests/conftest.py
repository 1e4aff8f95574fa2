import os
import sys

# Force a virtual 8-device CPU mesh for all tests (must run before jax
# backend initialization).  The environment pre-sets JAX_PLATFORMS=axon (a
# real-TPU tunnel registered by sitecustomize), which env vars alone cannot
# override — jax.config.update after import is the reliable route.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
