import os
import sys

# jax is pre-imported at interpreter startup by the machine's sitecustomize,
# so setting JAX_PLATFORMS here can be too late — force via jax.config.
# Tests run on a virtual multi-device CPU mesh so sharding is exercised
# without TPU hardware (the driver separately dry-runs multichip compile).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
