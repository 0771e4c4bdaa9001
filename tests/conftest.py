import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. XLA_FLAGS must be set before backend init; the
# platform override must go through jax.config because the environment's
# axon sitecustomize registers the TPU backend at interpreter start.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
