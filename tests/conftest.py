"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding code paths run against a faked device topology
(``xla_force_host_platform_device_count``) exactly as they would on a pod
slice — same psum/shard_map code, no TPU required.

Note: this environment's sitecustomize imports jax at interpreter start
(with JAX_PLATFORMS=axon), so plain env vars are too late; we override via
jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def english_text():
    words = (
        "the quick brown fox jumps over the lazy dog while 12345 birds "
        "don't sing they'll wait we've seen it's O'Brien's 2,097,152 tables "
        "naïve café ağır ğışçöü москва 北京 🙂 errors\nnewlines\r\nand tabs\t"
    ).split(" ")
    rs = np.random.default_rng(42)
    return " ".join(words[int(i)] for i in rs.integers(0, len(words), 4000))
