"""Test configuration: force the CPU backend with 8 virtual devices.

The image environment pre-registers a remote TPU ('axon') backend via
sitecustomize, which would make every jitted test a slow remote compile.
Tests run on jax-CPU (bit-exact integer paths) with an 8-device virtual mesh
for the sharding tests.  This must run before any backend is initialised.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
