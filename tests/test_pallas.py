"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from crackling_tpu.index import build_index
from crackling_tpu.ops.issl_pallas import PallasIsslScorer
from crackling_tpu.ops.oracle import score_bruteforce


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1 << 40, size=2500).astype(np.uint64)
    mut = []
    for sig in base[:600]:
        pos = rng.integers(0, 20)
        mut.append(
            (np.uint64(sig) & ~(np.uint64(3) << np.uint64(2 * pos)))
            | (np.uint64(rng.integers(0, 4)) << np.uint64(2 * pos))
        )
    sites = np.concatenate([base, np.array(mut, dtype=np.uint64),
                            rng.choice(base, 300)])
    index = build_index(sites)
    queries = np.concatenate(
        [base[:24], rng.integers(0, 1 << 40, 16).astype(np.uint64)])
    return index, queries


def test_pallas_matches_bruteforce(data):
    index, queries = data
    sc = PallasIsslScorer(index, max_dist=4, query_page=32,
                          superchunk=1024, interpret=True)
    m, c = sc.score_sums(queries)
    mb, cb = score_bruteforce(queries, index.site_sigs, index.occurrences, 4)
    np.testing.assert_allclose(m, mb, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(c, cb, rtol=2e-6, atol=1e-6)


def test_pallas_partial_page(data):
    index, queries = data
    sc = PallasIsslScorer(index, max_dist=4, query_page=32,
                          superchunk=1024, interpret=True)
    m5, c5 = sc.score_sums(queries[:5])
    m, c = sc.score_sums(queries)
    np.testing.assert_allclose(m5, m[:5], rtol=1e-6)
    np.testing.assert_allclose(c5, c[:5], rtol=1e-6)


def test_aligned_layout_consistency(data):
    index, _ = data
    arrs = index.device_arrays_aligned(align=1024, tail=1024)
    lens = arrs["bucket_lens"]
    offs = arrs["bucket_offsets"]
    assert (offs[:, :-1] % 1024 == 0).all()
    # entries within true lengths match the unaligned layout
    plain = index.device_arrays()
    for s in range(index.slice_count):
        for b in [0, 3, 100, 255]:
            n = lens[s, b]
            a0 = offs[s, b]
            p0 = index.bucket_offsets[s, b]
            assert (arrs["list_lo"][s, a0:a0 + n]
                    == plain["list_lo"][s, p0:p0 + n]).all()
            # padding entries are dead (occ == 0)
            assert (arrs["list_occ"][s, a0 + n:offs[s, b + 1]] == 0).all()
