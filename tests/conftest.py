"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised on virtual CPU devices, the TPU-world
substitute for a fake distributed backend (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
