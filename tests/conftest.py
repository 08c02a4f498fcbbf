import os

# Tests run on CPU with a virtual 8-device mesh so sharding paths are
# exercised without TPU hardware (SURVEY.md §4 strategy).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize force-registers the 'axon' TPU backend and
# overrides JAX_PLATFORMS; undo that before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
