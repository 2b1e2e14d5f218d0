"""Interpret-mode equivalence of the Pallas pack kernels vs the XLA packer.

The CPU suite exercises `packer.pack_fields` (the XLA formulation); the
Pallas banded kernels only run on real TPU hardware (bench.py). These tests
pin the Pallas kernels' semantics on CPU via `interpret=True` so a kernel
regression cannot hide until a TPU bench run. Shapes are kept small —
interpret mode executes the grid in Python.

Replaces: the reference has no analog (its bitwriter is scalar C,
src/libFLAC/bitwriter.c:544); this guards the TPU-native replacement.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from flac_tpu.encode import packer  # noqa: E402


def _random_fields(rng, B, F, maxwords, long_frac=0.05):
    nbits = rng.integers(0, 34, size=(B, F)).astype(np.int32)
    # sprinkle long unary-run-like fields (huge nbits, few significant bits)
    longm = rng.random((B, F)) < long_frac
    nbits = np.where(longm, rng.integers(34, 90, size=(B, F)), nbits)
    tot = nbits.sum(1)
    while (tot > maxwords * 32 - 32).any():
        nbits = np.where((tot > maxwords * 32 - 32)[:, None],
                         nbits // 2, nbits)
        tot = nbits.sum(1)
    sig = np.minimum(nbits, 33).astype(np.int64)
    values = rng.integers(0, 1 << 62, size=(B, F)) & ((1 << sig) - 1)
    return jnp.asarray(values), jnp.asarray(nbits)


CASES = [
    (8, 300, 96),      # typical density
    (8, 130, 6),       # extreme clustering: many fields per word
    (9, 257, 520),     # odd sizes (padding paths)
]


@pytest.mark.parametrize("impl", ["banded", "merged"])
@pytest.mark.parametrize("case", range(len(CASES)))
def test_pallas_matches_xla(impl, case):
    B, F, maxwords = CASES[case]
    rng = np.random.default_rng(7 * case + 1)
    values, nbits = _random_fields(rng, B, F, maxwords)
    ref_w, ref_t = packer.pack_fields(values, nbits, maxwords)
    fn = (packer.pack_fields_pallas if impl == "banded"
          else packer.pack_fields_pallas_merged)
    got_w, got_t = fn(values, nbits, maxwords, interpret=True)
    assert np.array_equal(np.asarray(ref_t), np.asarray(got_t))
    assert np.array_equal(np.asarray(ref_w).astype(np.uint32),
                          np.asarray(got_w).astype(np.uint32))


@pytest.mark.parametrize("impl", ["banded", "merged"])
def test_pallas_degenerate_zero_runs(impl):
    """Thousands of zero-length fields clustering in one word, plus 33-bit
    fields (the side-channel worst case) — the spill/merge edge cases."""
    rng = np.random.default_rng(42)
    B, F, maxwords = 8, 1400, 40
    nbits = np.zeros((B, F), np.int32)
    nbits[:, 0] = 20
    nbits[:, 700] = 33
    nbits[:, -1] = 33
    sig = np.minimum(nbits, 33).astype(np.int64)
    values = rng.integers(0, 1 << 62, size=(B, F)) & ((1 << sig) - 1)
    v, n = jnp.asarray(values), jnp.asarray(nbits)
    ref_w, ref_t = packer.pack_fields(v, n, maxwords)
    fn = (packer.pack_fields_pallas if impl == "banded"
          else packer.pack_fields_pallas_merged)
    got_w, got_t = fn(v, n, maxwords, interpret=True)
    assert np.array_equal(np.asarray(ref_t), np.asarray(got_t))
    assert np.array_equal(np.asarray(ref_w).astype(np.uint32),
                          np.asarray(got_w).astype(np.uint32))


def test_merged_all_spill():
    """Adjacent 33-significant-bit fields: no pair fits in 63 bits, so every
    round spills — the merged packer degenerates to the spill arrays."""
    rng = np.random.default_rng(5)
    B, F, maxwords = 8, 64, 70
    nbits = np.full((B, F), 33, np.int32)
    values = rng.integers(0, 1 << 33, size=(B, F))
    v, n = jnp.asarray(values), jnp.asarray(nbits)
    ref_w, ref_t = packer.pack_fields(v, n, maxwords)
    got_w, got_t = packer.pack_fields_pallas_merged(v, n, maxwords,
                                                    interpret=True)
    assert np.array_equal(np.asarray(ref_t), np.asarray(got_t))
    assert np.array_equal(np.asarray(ref_w).astype(np.uint32),
                          np.asarray(got_w).astype(np.uint32))
