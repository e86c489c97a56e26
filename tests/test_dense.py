"""Dense-matmul engine (ops/issl_dense.py) vs the brute-force oracle.

Interpret-mode pallas is expensive (the (5, 256) grid runs as Python), so
one consolidated scenario exercises scoring accuracy, paging, duplicate
queries in one bucket slot, and the and-method verdicts in two engine
invocations.
"""

import numpy as np
import pytest

from crackling_tpu.index import build_index
from crackling_tpu.ops.issl_dense import DenseIsslScorer
from crackling_tpu.ops.oracle import score_bruteforce


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 1 << 40, size=600).astype(np.uint64)
    mut = []
    for sig in base[:150]:
        pos = rng.integers(0, 20)
        mut.append(
            (np.uint64(sig) & ~(np.uint64(3) << np.uint64(2 * pos)))
            | (np.uint64(rng.integers(0, 4)) << np.uint64(2 * pos))
        )
    sites = np.concatenate([base, np.array(mut, dtype=np.uint64)])
    index = build_index(sites)
    # self-hits, mutated neighbours, absent queries, AND duplicates (the
    # same query occupying several slots of one bucket)
    queries = np.concatenate([
        base[:16],
        rng.integers(0, 1 << 40, 8).astype(np.uint64),
        np.repeat(base[3:5], 4),
    ])
    return index, queries


def test_dense_engine_vs_bruteforce(data):
    index, queries = data
    mit_b, cfd_b = score_bruteforce(queries, index.site_sigs,
                                    index.occurrences, 4)

    sc = DenseIsslScorer(index, max_dist=4, query_page=64, chunk=1024,
                         interpret=True)
    mit, cfd = sc.score_sums(queries)
    np.testing.assert_allclose(mit, mit_b, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(cfd, cfd_b, rtol=2e-5, atol=1e-5)

    # and-method verdicts agree with the oracle's full-scan verdicts
    mit_s, cfd_s = sc.score(queries)
    assert ((mit_s >= 75) == (10000.0 / (100.0 + mit_b) >= 75)).all()
    assert ((cfd_s >= 75) == (10000.0 / (100.0 + cfd_b) >= 75)).all()

    # paging: 2 pages (page < n) must reproduce the single-page sums
    sc2 = DenseIsslScorer(index, max_dist=4, query_page=16, chunk=1024,
                          interpret=True)
    m2, c2 = sc2.score_sums(queries)
    np.testing.assert_allclose(m2, mit, rtol=1e-6)
    np.testing.assert_allclose(c2, cfd, rtol=1e-6)


def test_hybrid_verdict_exact(data):
    """Hybrid = dense full-scan + bit-exact re-score of the band.

    Exercised with ``avg`` — the one method the round-1 engines could not
    verdict-guarantee. With a threshold placed in the middle of the score
    distribution a normal band catches real near-threshold queries; an
    infinite band forces every query through the MXU engine, so the
    output must equal the reference-exact emulation to the last bit
    (early-exit score values included).
    """
    from crackling_tpu.ops.issl_dense import HybridIsslScorer
    from crackling_tpu.ops.issl_jax import verdicts
    from crackling_tpu.ops.oracle import score_exact

    index, queries = data
    thr = 90.0
    mit_e, cfd_e = score_exact(index, queries, 4, thr, "avg")

    hy = HybridIsslScorer(index, max_dist=4, method="avg", threshold=thr,
                          band=1.0, query_page=64, chunk=1024,
                          interpret=True)
    mit, cfd = hy.score(queries)
    np.testing.assert_array_equal(verdicts(mit, cfd, thr, "avg"),
                                  verdicts(mit_e, cfd_e, thr, "avg"))

    hy.band = np.inf
    mit_a, cfd_a = hy.score(queries)
    np.testing.assert_array_equal(mit_a, mit_e)
    np.testing.assert_array_equal(cfd_a, cfd_e)


def test_hybrid_cpu_f64_fallback(data, monkeypatch):
    """When the MXU engine is infeasible (rank bound, or one-hot planes
    too big for HBM at mammal depth), the hybrid re-scores on the CPU
    backend in true f64 — still equal to the reference-exact emulation
    to the last bit, and the global x64 flag is restored afterwards."""
    import jax

    from crackling_tpu.ops import issl_mxu
    from crackling_tpu.ops.issl_dense import HybridIsslScorer
    from crackling_tpu.ops.oracle import score_exact

    def refuse(self, *a, **k):
        raise ValueError("one-hot planes need too much HBM (test)")

    monkeypatch.setattr(issl_mxu.MxuIsslScorer, "__init__", refuse)
    # also disable the (preferred) native C re-scorer so the last-resort
    # XLA-on-CPU path is the one under test
    from crackling_tpu import native
    monkeypatch.setattr(native, "exact_score_native",
                        lambda *a, **k: None)

    index, queries = data
    thr = 90.0
    mit_e, cfd_e = score_exact(index, queries, 4, thr, "avg")
    hy = HybridIsslScorer(index, max_dist=4, method="avg", threshold=thr,
                          band=np.inf, query_page=64, chunk=1024,
                          interpret=True)
    prev_x64 = bool(jax.config.jax_enable_x64)
    mit, cfd = hy.score(queries)
    assert hy._exact_x64, "fallback path not taken"
    assert bool(jax.config.jax_enable_x64) == prev_x64
    np.testing.assert_array_equal(mit, mit_e)
    np.testing.assert_array_equal(cfd, cfd_e)


def test_hybrid_avg_early_exit_accept():
    """The reference's ``avg`` early exit freezes both sums when the
    average of the SUMS crosses the limit, while the pipeline thresholds
    the average of the SCORES — by convexity the frozen score average
    can accept a query whose full-scan average is far below threshold.
    The hybrid must re-score such queries exactly (regression: the
    band-only rule missed them).

    Construction: a query with MIT-only neighbours (mismatches at CFD
    zero-penalty positions), light occurrences first in scan order so
    the binary exits while its MIT score is still moderate (CFD frozen
    at 100), then one heavy-occurrence neighbour the exit never reaches.
    """
    from crackling_tpu.ops.issl_dense import HybridIsslScorer
    from crackling_tpu.ops.oracle import score_exact

    rng = np.random.default_rng(23)
    q = np.uint64(rng.integers(0, 1 << 40))
    # q[13] = T, q[15] = A (2-bit codes at bit positions 26/30)
    q = (q & ~(np.uint64(3) << np.uint64(26))) | (np.uint64(3) << np.uint64(26))
    q = q & ~(np.uint64(3) << np.uint64(30))

    def sub(sig, pos, base):
        return ((np.uint64(sig) & ~(np.uint64(3) << np.uint64(2 * pos)))
                | (np.uint64(base) << np.uint64(2 * pos)))

    # CFD zero-penalty single mismatches: (13, T->G), (15, A->C), (15, A->T)
    light1 = sub(q, 13, 2)     # lex-first (G < T at pos 13)
    light2 = sub(q, 15, 1)
    heavy = sub(q, 15, 3)      # lex-last of the three
    # background sites far from q (Hamming > 8) so they never hit
    def hamming(a, b):
        x = np.uint64(a) ^ np.uint64(b)
        x = ((x & np.uint64(0xAAAAAAAAAA)) >> np.uint64(1)) | (x & np.uint64(0x5555555555))
        return bin(int(x)).count("1")
    bg = []
    while len(bg) < 512:
        s = np.uint64(rng.integers(0, 1 << 40))
        if hamming(s, q) > 8:
            bg.append(s)
    sites = np.array([light1] * 2 + [light2] * 3 + [heavy] * 50 + bg,
                     dtype=np.uint64)
    index = build_index(sites)

    queries = np.concatenate([[q], bg[:7]]).astype(np.uint64)
    ref_mit, ref_cfd = score_exact(index, queries, 4, 75.0, "avg")
    ref_ok = (ref_mit + ref_cfd) / 2.0 >= 75.0
    # the construction must produce the exit-accept case for q
    assert ref_ok[0], (ref_mit[0], ref_cfd[0])

    hyb = HybridIsslScorer(index, max_dist=4, method="avg", threshold=75.0,
                           chunk=1024, interpret=True)
    mit, cfd = hyb.score(queries)
    hyb_ok = (mit + cfd) / 2.0 >= 75.0
    np.testing.assert_array_equal(hyb_ok, ref_ok)
    # and the re-scored query carries the binary's exact frozen scores
    np.testing.assert_allclose(mit[0], ref_mit[0], rtol=1e-12)
    np.testing.assert_allclose(cfd[0], ref_cfd[0], rtol=1e-12)


@pytest.mark.parametrize("method", ["mit", "cfd", "and", "or", "avg"])
def test_hybrid_verdicts_match_oracle_all_methods(data, method):
    """Hybrid verdicts == bit-exact oracle verdicts for every method on a
    mixed query set (self-hits, near neighbours, absent, duplicates)."""
    from crackling_tpu.ops.issl_dense import HybridIsslScorer
    from crackling_tpu.ops.issl_jax import verdicts
    from crackling_tpu.ops.oracle import score_exact

    index, queries = data
    ref_mit, ref_cfd = score_exact(index, queries, 4, 75.0, method)
    hyb = HybridIsslScorer(index, max_dist=4, method=method,
                           threshold=75.0, chunk=1024, interpret=True)
    mit, cfd = hyb.score(queries)
    np.testing.assert_array_equal(
        verdicts(mit, cfd, 75.0, method),
        verdicts(ref_mit, ref_cfd, 75.0, method))
