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


def test_replay_native_matches_python_fallback(data, monkeypatch):
    """The C replay (replay.cpp) and the pure-Python loop are the same
    recurrence; their outputs must be bit-identical on a mixed page for
    every method (incl. the exit-order-sensitive avg)."""
    from crackling_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    index, queries = data
    outs = {}
    for force_py in (False, True):
        if force_py:
            monkeypatch.setattr(native, "replay_accumulate_native",
                                lambda *a, **k: None)
        for method in ("and", "avg"):
            eng = MxuIsslScorer(index, max_dist=4, method=method,
                                threshold=75.0, query_page=512, chunk=1024,
                                interpret=True)
            outs[(force_py, method)] = eng.score(queries)
    for method in ("and", "avg"):
        m_n, c_n = outs[(False, method)]
        m_p, c_p = outs[(True, method)]
        assert np.array_equal(m_n, m_p)
        assert np.array_equal(c_n, c_p)


def test_replay_repeat_rich_throughput():
    """A repeat-rich page (every query flagged, method=avg) must not
    collapse to Python speed: 2M-hit replay through the native path in
    well under a second (the Python loop takes ~1 min)."""
    import time

    from crackling_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    n_groups, per = 2000, 1000           # 2M hits
    mit_c = rng.random(n_groups * per)
    cfd_c = rng.random(n_groups * per)
    keep = (rng.random(n_groups * per) < 0.9).astype(np.uint8)
    starts = np.arange(n_groups + 1, dtype=np.int64) * per
    t0 = time.time()
    out = native.replay_accumulate_native(starts, mit_c, cfd_c, keep,
                                          "avg", 1e9)
    dt = time.time() - t0
    assert out is not None
    m, cc = out
    # spot-check group 7 against the sequential definition
    g = slice(7 * per, 8 * per)
    ref_m = mit_c[g][keep[g] == 1].cumsum()
    assert m[7] == ref_m[-1]
    assert dt < 5.0, f"native replay too slow: {dt:.2f}s for 2M hits"
