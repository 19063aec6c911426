"""Pytest bootstrap: run every test on an 8-device virtual CPU mesh.

The container's ``sitecustomize.py`` registers the axon TPU PJRT plugin at
interpreter start, making the single real TPU chip the default JAX platform.
Tests instead want a deterministic 8-device CPU mesh (for sharding tests and
fast iteration).  The CPU backend is created lazily, so setting ``XLA_FLAGS``
here (before any test imports jax) and switching ``jax_platforms`` to cpu is
sufficient — no subprocess tricks needed.
"""

import os
import sys

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of the pytest invocation cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute convergence/multi-process tests "
        "(deselect with -m 'not slow')")
