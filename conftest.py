# Root conftest: make `mapping_tpu` importable and force tests onto a virtual
# 8-device CPU mesh (the TPU-world analog of a fake backend; see SURVEY.md §4).
# Must run before jax is imported anywhere.
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
