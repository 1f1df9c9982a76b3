"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests run on
``xla_force_host_platform_device_count=8`` CPU devices, per SURVEY.md §4's
test strategy (the reference has no tests at all — this suite is built from
scratch against the golden model in kmer_counter_tpu.golden).
"""

import os

# Force CPU: the ambient environment registers an 'axon' remote TPU backend
# from sitecustomize and force-selects it via jax.config at import time, so
# setting the JAX_PLATFORMS env var is not enough — re-override the config
# after importing jax (every test would otherwise compile over RPC to the
# real chip).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_reads(rng, n_reads, line_length, invalid_frac=0.0, alphabet="ACGT"):
    """Dense [R, L] uint8 ASCII read matrix with optional invalid bases."""
    chars = np.frombuffer("".join(alphabet).encode(), dtype=np.uint8)
    reads = chars[rng.integers(0, len(chars), size=(n_reads, line_length))]
    if invalid_frac > 0:
        mask = rng.random((n_reads, line_length)) < invalid_frac
        reads = np.where(mask, np.uint8(ord("N")), reads)
    return reads


@pytest.fixture
def make_reads(rng):
    def _make(n_reads, line_length, invalid_frac=0.0):
        return random_reads(rng, n_reads, line_length, invalid_frac)

    return _make
