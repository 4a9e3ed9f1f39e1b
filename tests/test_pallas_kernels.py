"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import numpy as np
import pytest

from supernova_tpu.core import kmer_codec as kc
from supernova_tpu.ops.pallas.kmer_extract import sliding_words_pallas


def test_sliding_words_pallas_matches_xla(rng):
    n = 512  # multiple of 128
    codes = rng.integers(0, 4, n + 128, dtype=np.int32)
    ref = kc.sliding_words(codes, n)
    got = sliding_words_pallas(codes, n, interpret=True)
    assert np.array_equal(np.asarray(got.a), np.asarray(ref.a))
    assert np.array_equal(np.asarray(got.b), np.asarray(ref.b))
    assert np.array_equal(np.asarray(got.c), np.asarray(ref.c))


def test_sliding_words_pallas_multi_block(rng):
    n = 128 * 300  # forces row padding to the next BLOCK_ROWS multiple
    codes = rng.integers(0, 4, n + 128, dtype=np.int32)
    ref = kc.sliding_words(codes, n)
    got = sliding_words_pallas(codes, n, interpret=True)
    assert np.array_equal(np.asarray(got.a), np.asarray(ref.a))
    assert np.array_equal(np.asarray(got.c), np.asarray(ref.c))
