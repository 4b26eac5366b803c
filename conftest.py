# Root conftest: make `mapping_tpu` importable and force tests onto a virtual
# 8-device CPU mesh (the TPU-world analog of a fake backend; see SURVEY.md §4).
#
# The sandbox preloads jax (sitecustomize pulls in the axon TPU plugin), so
# env vars alone are read too early to help; update jax.config directly —
# backends have not initialized yet at conftest import time, so this wins as
# long as no test-session code touched jax.devices() first.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast suite is compile-bound on this
# 1-core host; cached XLA executables make repeat runs (~CI) several times
# faster. The path is keyed by the host CPU's feature set: XLA loads AOT
# results compiled on a different machine with only a warning, and the
# mismatched codegen produces subtly different numerics (observed as a 3e-3
# trajectory split between two train programs, one cached one fresh).
import hashlib

try:
    with open("/proc/cpuinfo") as f:
        _flags = next(l for l in f if l.startswith("flags"))
except (OSError, StopIteration):
    _flags = "unknown"
_cpu_key = hashlib.md5(_flags.encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/mapping_tpu_test_jaxcache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
