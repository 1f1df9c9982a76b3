"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kmer_counter_tpu.ops import extract_chunk
import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "experiments_pallas_extract",
    _os.path.join(_os.path.dirname(__file__), "experiments_pallas_extract.py"),
)
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
extract_chunk_lanes_major = _mod.extract_chunk_lanes_major


@pytest.mark.parametrize("k", [15, 31, 33, 55])
@pytest.mark.parametrize("canonical", [False, True])
def test_pallas_extract_matches_xla(rng, k, canonical):
    L = max(k + 12, 50)
    reads = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(128, L))
    out = extract_chunk_lanes_major(
        jnp.asarray(reads), k, canonical, block_rows=64
    )
    lanes_ref, counts_ref = extract_chunk(jnp.asarray(reads), k, canonical)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[-1], np.asarray(counts_ref))
    np.testing.assert_array_equal(out[:-1], np.asarray(lanes_ref))


def test_pallas_extract_rejects_bad_block(rng):
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(100, 40))
    with pytest.raises(ValueError):
        extract_chunk_lanes_major(jnp.asarray(reads), 15, block_rows=64)
