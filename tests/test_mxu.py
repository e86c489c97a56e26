"""MXU engine correctness: bit-exact vs the scan-order oracle.

The MXU engine (ops/issl_mxu.py) must reproduce the reference binary's
output exactly — the oracle (ops/oracle.py) is itself validated
%f-identical against ``isslScoreOfftargets`` in test_scorer.py, so equality
with the oracle here is transitive bit-exactness for every method,
including the early-exit-order-sensitive ``avg``.
"""

import numpy as np
import pytest

from crackling_tpu.index import build_index
from crackling_tpu.ops.issl_mxu import MxuIsslScorer
from crackling_tpu.ops.oracle import score_exact


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    base = rng.integers(0, 1 << 40, size=3000, dtype=np.uint64)
    # planted near-duplicates so neighbour flags and early exits fire
    mut = base[rng.integers(0, 3000, 500)]
    pos = rng.integers(0, 20, 500).astype(np.uint64)
    delta = rng.integers(1, 4, 500).astype(np.uint64)
    mut = mut ^ (delta << (2 * pos))
    # heavy repeats: high occurrence counts trigger genuine early exits
    hot = np.repeat(base[rng.integers(0, 100, 40)], 30)
    sites = np.concatenate([base, mut, base[rng.integers(0, 3000, 800)], hot])
    index = build_index(sites, seq_length=20, slice_width=8)
    queries = np.concatenate([
        base[:200],
        rng.integers(0, 1 << 40, size=100, dtype=np.uint64),
    ])
    return index, queries


@pytest.mark.parametrize("method", ["and", "or", "mit", "cfd", "avg"])
def test_mxu_bit_exact(data, method):
    index, queries = data
    eng = MxuIsslScorer(index, max_dist=4, method=method, threshold=75.0,
                        query_page=512, chunk=1024, interpret=True)
    m1, c1 = eng.score(queries)
    m2, c2 = score_exact(index, queries, 4, 75.0, method)
    assert np.array_equal(m1, m2)
    assert np.array_equal(c1, c2)


def test_mxu_flags_cover_neighbours(data):
    """Every query with an in-range neighbour (dist 1..4) is flagged."""
    index, queries = data
    eng = MxuIsslScorer(index, max_dist=4, query_page=512, chunk=1024,
                        interpret=True)
    counts = eng.neighbour_counts(queries)
    sites = index.site_sigs
    even = np.uint64(0xAAAAAAAAAAAAAAAA)
    odd = np.uint64(0x5555555555555555)
    for qi, q in enumerate(queries[:64]):
        x = q ^ sites
        mm = ((x & even) >> np.uint64(1)) | (x & odd)
        d = np.array([int(v).bit_count() for v in mm])
        has_neigh = bool(((d >= 1) & (d <= 4)).any())
        assert (counts[qi] > 0) == has_neigh


def test_mxu_small_max_dist(data):
    index, queries = data
    eng = MxuIsslScorer(index, max_dist=2, method="and", threshold=75.0,
                        query_page=512, chunk=1024, interpret=True)
    m1, c1 = eng.score(queries[:50])
    m2, c2 = score_exact(index, queries[:50], 2, 75.0, "and")
    assert np.array_equal(m1, m2)
    assert np.array_equal(c1, c2)


def test_mxu_multi_page(data):
    index, queries = data
    eng1 = MxuIsslScorer(index, max_dist=4, query_page=64, chunk=1024,
                         interpret=True)
    eng2 = MxuIsslScorer(index, max_dist=4, query_page=512, chunk=1024,
                         interpret=True)
    m1, c1 = eng1.score(queries[:130])
    m2, c2 = eng2.score(queries[:130])
    assert np.array_equal(m1, m2)
    assert np.array_equal(c1, c2)
