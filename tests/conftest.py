import os

# Run the test-suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths are exercised without TPU hardware (same trick as the reference's
# demos/re/a_demo_multi-gpu.py:20-23).  Note: the env-var JAX_PLATFORMS is
# not honored when an out-of-tree TPU plugin is installed — use the config
# API, which is.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
