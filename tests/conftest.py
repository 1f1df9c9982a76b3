"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests run on
``xla_force_host_platform_device_count=8`` CPU devices, per SURVEY.md §4's
test strategy (the reference has no tests at all — this suite is built from
scratch against the golden model in kmer_counter_tpu.golden).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
