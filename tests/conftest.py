"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-chip sharding logic is validated without TPU hardware via XLA's
host-platform device partitioning (SURVEY.md §4 test plan). This
environment injects a remote-TPU "axon" platform as the default; tests pin
the platform to CPU (``jax.config.update``) so they are hermetic and fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
