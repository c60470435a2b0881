"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised on virtual CPU devices, the TPU-world
substitute for a fake distributed backend (SURVEY.md section 4).

Note: this environment's sitecustomize imports jax at interpreter boot with
JAX_PLATFORMS=axon (real TPU tunnel), so env vars set here are too late --
we must go through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
