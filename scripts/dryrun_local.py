#!/usr/bin/env python
"""Local harness for __graft_entry__ on 8 virtual CPU devices.

The environment pins JAX_PLATFORMS=axon and a sitecustomize imports jax at
interpreter start, so env vars alone don't switch backends — override via
jax.config after import (same trick as tests/conftest.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import dryrun_multichip, entry  # noqa: E402

fn, args = entry()
out = jax.jit(fn)(*args)
print("entry ok", out.shape)
dryrun_multichip(8)
