import os

# Virtual 8-device CPU mesh for sharding tests. Note: under the axon TPU
# tunnel JAX_PLATFORMS=cpu is overridden by the plugin env, so we ALSO pin
# the default device to CPU below — eager test ops on the remote-compiled
# TPU backend are orders of magnitude slower than CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
if os.environ.get("APNERF_TPU_TESTS", "0") != "1":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
