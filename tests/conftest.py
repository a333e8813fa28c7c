import os

# Simulate an 8-device TPU slice on CPU so sharding/collective tests run
# anywhere, hermetically and fast (SURVEY.md §4d).
#
# The axon TPU plugin registers itself from sitecustomize at interpreter
# startup (before pytest imports this file), so setting env vars alone is not
# enough: jax is already imported with JAX_PLATFORMS=axon. Force the platform
# through the live config instead; this works as long as no backend has been
# initialized yet, which holds at conftest-import time.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the host CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"
