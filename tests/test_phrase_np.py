"""Property tests: the vectorized phrase kernels are bit-identical to the
per-document oracle walk (oracle.sloppy_phrase_freq / set intersection)."""

import numpy as np
import pytest

from ferret_spark.oracle import sloppy_phrase_freq
from ferret_spark.phrase_np import exact_freqk_batch, sloppy_freq2_batch


def _rand_doc(rng, max_pos=30):
    n = int(rng.integers(1, min(12, max_pos) + 1))
    return np.sort(rng.choice(max_pos, size=n, replace=False)).astype(np.int64)


@pytest.mark.parametrize("offs", [(0, 1), (0, 2), (1, 2), (2, 5)])
@pytest.mark.parametrize("slop", [0, 1, 2, 3, 7])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sloppy2_matches_oracle_random(offs, slop, seed):
    """Random sweeps, including tie-heavy small position ranges (odd
    seeds) and skip-slot offsets that drive adjusted positions negative."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    off_a, off_b = offs
    max_pos = 8 if seed % 2 else 30
    docs_a = [_rand_doc(rng, max_pos) for _ in range(200)]
    docs_b = [_rand_doc(rng, max_pos) for _ in range(200)]
    got = sloppy_freq2_batch(docs_a, docs_b, off_a, off_b, slop)
    for i in range(200):
        want = sloppy_phrase_freq(
            [(docs_a[i] - off_a).tolist(), (docs_b[i] - off_b).tolist()],
            [off_a, off_b],
            slop,
            False,
        )
        assert got[i] == want, (i, docs_a[i], docs_b[i], got[i], want)


def test_sloppy2_exhaustive_small():
    """Every pair of nonempty subsets of {0..5} as the two position lists
    (ties, exhaustion-at-init, chains through both lists)."""
    from itertools import combinations

    universe = range(6)
    subsets = [
        list(c) for r in range(1, 4) for c in combinations(universe, r)
    ]
    for a in subsets:
        for b in subsets:
            for slop in (0, 1, 2):
                got = sloppy_freq2_batch(
                    [np.array(a)], [np.array(b)], 0, 1, slop
                )[0]
                want = sloppy_phrase_freq(
                    [a, [x - 1 for x in b]], [0, 1], slop, False
                )
                assert got == want, (a, b, slop, got, want)


def test_sloppy2_adjacent_pair_is_one():
    got = sloppy_freq2_batch([np.array([3])], [np.array([4])], 0, 1, 0)
    assert got[0] == 1.0


def test_sloppy2_empty_rows_and_batch():
    assert sloppy_freq2_batch([], [], 0, 1, 2).shape == (0,)
    got = sloppy_freq2_batch(
        [np.array([1, 2]), np.array([], dtype=np.int64)],
        [np.array([], dtype=np.int64), np.array([3])],
        0, 1, 3,
    )
    assert got.tolist() == [0.0, 0.0]


@pytest.mark.parametrize("slop", [0, 2, 5])
def test_sloppy2_long_chains_cross_round_cap(slop):
    """Docs with 40-120 occurrences per slot force the per-doc tail path
    past _ROUND_CAP — partial lock-step sums must be discarded exactly."""
    rng = np.random.Generator(np.random.Philox(key=5))
    docs_a, docs_b = [], []
    for _ in range(50):
        docs_a.append(
            np.sort(rng.choice(1000, size=int(rng.integers(40, 120)),
                               replace=False)).astype(np.int64)
        )
        docs_b.append(
            np.sort(rng.choice(1000, size=int(rng.integers(40, 120)),
                               replace=False)).astype(np.int64)
        )
    got = sloppy_freq2_batch(docs_a, docs_b, 0, 1, slop)
    for i in range(50):
        want = sloppy_phrase_freq(
            [docs_a[i].tolist(), (docs_b[i] - 1).tolist()], [0, 1], slop, False
        )
        assert got[i] == want


@pytest.mark.parametrize("k", [2, 3, 4])
def test_exact_k_matches_sets(k):
    rng = np.random.Generator(np.random.Philox(key=17 + k))
    n = 200
    slots = [[_rand_doc(rng) for _ in range(n)] for _ in range(k)]
    offsets = list(range(k))
    got = exact_freqk_batch(slots, offsets)
    for i in range(n):
        sets = [set((slots[j][i] - offsets[j]).tolist()) for j in range(k)]
        want = float(len(set.intersection(*sets)))
        assert got[i] == want
