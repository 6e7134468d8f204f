"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This simulates an 8-chip TPU slice for sharding / collective tests without
hardware (SURVEY.md §4). Note: this image's sitecustomize imports jax at
interpreter startup (axon TPU plugin), so the ``JAX_PLATFORMS`` env var is
already latched by the time conftest runs — we must override through
``jax.config`` instead. ``XLA_FLAGS`` is still read lazily at CPU-client
creation, so setting it here works as long as no test touched a device first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
