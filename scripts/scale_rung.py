"""Mouse-scale rung: extract -> index -> score a >=300M-occurrence genome.

Generates a repeat-rich synthetic genome (2.6 Gbp sampled from a 600 Mbp
base pool — repetitive like a real mammalian genome, so occurrences pile
onto ~75M distinct sites and the index fits one chip's HBM), then drives
the full memory-bounded data path:

  1. extractOfftargets CLI (streaming scan + external sort, text output)
  2. createIsslIndex CLI   (streamed text -> index, distinct-bounded)
  3. TPU scoring bench on the real chip vs the reference binary

Peak-RSS of each stage is recorded via /usr/bin/time -v. Results are
printed as a JSON line and appended to scripts/scale_rung_results.jsonl;
BASELINE.md summarizes the ladder.

Any rung of the BASELINE.md ladder can be run by size: --gbp 0.0046
(E. coli scale), 0.012 (S. cerevisiae), 0.14 (D. melanogaster), 2.6
(mouse GRCm39), 3.1 (human GRCh38). Artifacts are tagged per rung so
rungs coexist under bench_data/scale/.

Usage: python scripts/scale_rung.py [--gbp 2.6] [--pool-mbp 600]
                                    [--engine pallas|dense]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
DATA = ROOT / "bench_data" / "scale"
REFERENCE = Path("/root/reference")


def log(msg):
    print(f"[scale] {msg}", file=sys.stderr, flush=True)


def timed_cli(args, tag):
    """Run a CLI, sampling peak RSS; returns (seconds, peak_rss_gb)."""
    import tempfile

    t0 = time.time()
    # spool output to files: an undrained PIPE deadlocks once the child
    # writes past the ~64 KiB pipe buffer (progress logs do at scale)
    with tempfile.TemporaryFile(mode="w+") as out, \
            tempfile.TemporaryFile(mode="w+") as err:
        p = subprocess.Popen(
            [sys.executable, "-m", "crackling_tpu.utils.run_cli", *args],
            stdout=out, stderr=err, text=True, cwd=ROOT)
        peak = 0
        while p.poll() is None:
            try:
                with open(f"/proc/{p.pid}/status") as fp:
                    m = re.search(r"VmHWM:\s+(\d+) kB", fp.read())
                if m:
                    peak = max(peak, int(m.group(1)))
            except OSError:
                pass
            time.sleep(0.5)
        dt = time.time() - t0
        if p.returncode != 0:
            err.seek(0)
            raise RuntimeError(f"{tag} failed:\n{err.read()[-2000:]}")
    rss = peak / 1e6
    log(f"{tag}: {dt:.0f}s, peak RSS {rss:.1f} GB")
    return dt, rss


def make_genome(path, gbp, pool_mbp, seed=20260817):
    if path.exists():
        log(f"genome cached: {path}")
        return
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    log(f"generating {pool_mbp} Mbp base pool")
    pool = bases[rng.integers(0, 4, size=pool_mbp * 1_000_000)]
    n_chunks = int(gbp * 1000 / 1)  # 1 Mbp chunks
    chrom_chunks = max(1, n_chunks // 20)
    log(f"writing {n_chunks} x 1 Mbp chunks sampled from the pool")
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as fp:
        for c in range(n_chunks):
            if c % chrom_chunks == 0:
                fp.write(f">chr{c // chrom_chunks + 1}\n".encode())
            off = int(rng.integers(0, pool.shape[0] - 1_000_000))
            chunk = pool[off:off + 1_000_000]
            # wrap at 100 cols, vectorized
            rows = chunk.reshape(-1, 100)
            out = np.empty((rows.shape[0], 101), dtype=np.uint8)
            out[:, :100] = rows
            out[:, 100] = ord("\n")
            out.tofile(fp)
    tmp.rename(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=2.6)
    ap.add_argument("--pool-mbp", type=int, default=600)
    ap.add_argument("--queries", type=int, default=16384)
    ap.add_argument("--ref-queries", type=int, default=512)
    ap.add_argument("--engine", default="pallas",
                    help="comma-separated list from {pallas, dense, "
                         "compact, hybrid, hybrid-compact, hybrid-dense} "
                         "— all timed in one process on one index "
                         "upload. hybrid = the pipeline path: "
                         "engine=auto's fast-engine pick wrapped in the "
                         "bit-exact near-threshold re-score; "
                         "hybrid-compact / hybrid-dense pin the fast "
                         "path explicitly (crossover-tuning)")
    ap.add_argument("--method", default="and",
                    choices=("mit", "cfd", "and", "or", "avg"),
                    help="scoring method for our engine, the reference "
                         "binary, and the verdict comparison")
    ap.add_argument("--ref-repeats", type=int, default=3,
                    help="best-of-N repeats for each reference timing run "
                         "(drop to 1-2 at mouse/human depth, where one "
                         "5N-query run takes the better part of an hour)")
    ap.add_argument("--reuse-ref", action="store_true",
                    help="reuse this rung's cached reference timing and "
                         "output (recorded by a previous run of the same "
                         "tag) instead of re-running the binary — for "
                         "timing a second engine on a deep rung without "
                         "repaying hours of C++ baseline")
    args = ap.parse_args()
    valid = {"pallas", "dense", "compact", "hybrid", "hybrid-compact",
             "hybrid-dense"}
    bad = set(args.engine.split(",")) - valid
    if bad:
        ap.error(f"unknown engine(s): {sorted(bad)}")

    DATA.mkdir(parents=True, exist_ok=True)
    tag = f"g{args.gbp:g}b"
    genome = DATA / f"{tag}.fa"
    # the original mouse-scale run predates per-rung tags; keep its names
    legacy = args.gbp == 2.6 and (DATA / "sites.txt").exists()
    sites = DATA / ("sites.txt" if legacy else f"{tag}.sites.txt")
    index_npz = DATA / ("scale.index.npz" if legacy
                        else f"{tag}.index.npz")
    issl = DATA / ("scale.issl" if legacy else f"{tag}.issl")

    make_genome(genome, args.gbp, args.pool_mbp)
    results = {"genome_gbp": args.gbp, "pool_mbp": args.pool_mbp,
               "engine": args.engine, "method": args.method}

    if not sites.exists():
        dt, rss = timed_cli(
            ["extractOfftargets", str(sites), str(genome)], "extract")
        results["extract_s"] = round(dt, 1)
        results["extract_rss_gb"] = round(rss, 2)
    n_occurrences = sites.stat().st_size // 21
    results["occurrences"] = int(n_occurrences)
    log(f"{n_occurrences:,} site occurrences")

    if not index_npz.exists():
        dt, rss = timed_cli(
            ["createIsslIndex", str(sites), "20", "8", str(index_npz)],
            "index build")
        results["build_s"] = round(dt, 1)
        results["build_rss_gb"] = round(rss, 2)

    from crackling_tpu.index import load_native, write_reference_issl

    log("loading index")
    index = load_native(str(index_npz))
    results["distinct_sites"] = int(index.num_sites)
    log(f"{index.num_sites:,} distinct sites")

    if not issl.exists():
        log("writing reference-format .issl for the baseline")
        write_reference_issl(index, str(issl))

    # queries: candidate guides from the first Mbp of the genome
    from crackling_tpu.codec import sigs_to_strings
    from crackling_tpu.index.extract import find_candidate_guides_seq

    with open(genome) as fp:
        fp.readline()
        seq = "".join(fp.readline().strip() for _ in range(12000))
    _, _, cand = find_candidate_guides_seq(seq)
    queries = np.unique(cand & np.uint64((1 << 40) - 1))
    rng = np.random.default_rng(7)
    rng.shuffle(queries)
    queries = queries[: args.queries]
    log(f"{queries.shape[0]} queries")

    # ---- our engine(s) on the real chip ----
    import jax

    log(f"devices: {jax.devices()}")

    def make_engine(name, res):
        if name == "dense":
            from crackling_tpu.ops.issl_dense import \
                DenseIsslScorer as Engine
        elif name == "compact":
            from crackling_tpu.ops.issl_compact import \
                CompactIsslScorer as Engine
        elif name.startswith("hybrid"):
            # the pipeline path: a fast engine wrapped in
            # HybridIsslScorer's near-threshold bit-exact re-score (what
            # `[tpu] engine = auto` actually runs). Bare "hybrid" uses
            # select_auto_engine's pick; the suffixed forms pin it
            # (crossover-tuning measurements).
            from crackling_tpu.ops.issl_compact import CompactIsslScorer
            from crackling_tpu.ops.issl_dense import (DenseIsslScorer,
                                                      HybridIsslScorer)
            from crackling_tpu.pipeline.run import select_auto_engine

            if name == "hybrid":
                fast_name = select_auto_engine(index, jax.default_backend())
            else:
                fast_name = name.split("-", 1)[1]
            log(f"hybrid fast path: {fast_name}")
            res["hybrid_fast"] = fast_name
            fast_cls = (CompactIsslScorer if fast_name == "compact"
                        else DenseIsslScorer)

            def Engine(index, max_dist):
                hyb = HybridIsslScorer(index, max_dist=max_dist,
                                       method=args.method, threshold=75.0,
                                       dense=fast_cls(index,
                                                      max_dist=max_dist))
                res["hybrid_band"] = hyb.band
                return hyb
        else:
            from crackling_tpu.ops.issl_pallas import \
                PallasIsslScorer as Engine
        return Engine

    def time_engine(name, res):
        Engine = make_engine(name, res)
        t0 = time.time()
        scorer = Engine(index, max_dist=4)
        mit, cfd = scorer.score(queries)      # compile + warm
        log(f"[{name}] compile+warm {time.time() - t0:.0f}s")
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            mit, cfd = scorer.score(queries)
            dt = min(dt, time.time() - t0)
        ours_rate = queries.shape[0] / dt
        res["ours_guides_per_s"] = round(ours_rate, 1)
        if hasattr(scorer, "last_rescored"):
            res["rescored"] = scorer.last_rescored
            log(f"[{name}] hybrid exact re-scores: {scorer.last_rescored}")
        log(f"[{name}] ours: {dt:.2f}s -> {ours_rate:,.0f} guides/s")
        return mit, cfd

    # ---- reference baseline (two-size, load time removed) ----
    refbin = ROOT / "bench_data" / "refbin" / "isslScoreOfftargets"
    if not refbin.exists():
        refbin.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++11", "-fopenmp", "-mpopcnt",
             f"-I{REFERENCE}/src/ISSL/include", "-o", str(refbin),
             str(REFERENCE / "src/ISSL/isslScoreOfftargets.cpp")],
            check=True, capture_output=True)
    q1 = DATA / f"{tag}.q1.txt"
    q5 = DATA / f"{tag}.q5.txt"
    # the two-size subtraction removes index-load time, but it only
    # resolves if the query phase dominates the load-time variance:
    # scale the reference query count with index depth (per-query cost
    # is ~linear in distinct sites / 256, isslScoreOfftargets.cpp:344)
    # capped: at genome scale the reference runs minutes/kilo-query, and
    # the delta already resolves at a few thousand queries
    n_ref = min(len(queries), 4096,
                max(args.ref_queries, int(index.num_sites // 4000)))
    qtext = "".join(s + "\n" for s in sigs_to_strings(queries[:n_ref], 20))
    results["ref_queries"] = int(n_ref)
    q1.write_text(qtext)
    q5.write_text(qtext * 5)

    def run_ref(qf, repeats=args.ref_repeats):
        best, out = float("inf"), None
        for _ in range(repeats):
            t0 = time.time()
            res = subprocess.run(
                [str(refbin), str(issl), str(qf), "4", "75", args.method],
                check=True, capture_output=True, text=True)
            dt = time.time() - t0
            if dt < best:
                best, out = dt, res.stdout
        return best, out

    msuf = "" if args.method == "and" else f".{args.method}"
    refout = DATA / f"{tag}.refout{n_ref}{msuf}.txt"
    results_path = ROOT / "scripts" / "scale_rung_results.jsonl"
    study_path = ROOT / "scripts" / "baseline_study_results.jsonl"
    cached_rate = None
    if args.reuse_ref and args.method == "and" and study_path.exists():
        # prefer the controlled interleaved study (best-of-rounds): the
        # ad-hoc per-run timings proved load-sensitive by up to 5x
        for line in study_path.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("n_queries") == n_ref:
                cached_rate = rec.get(f"g{args.gbp:g}b_best", cached_rate)
    if args.reuse_ref and cached_rate is None and results_path.exists():
        for line in results_path.read_text().splitlines():
            rec = json.loads(line)
            if (rec.get("genome_gbp") == args.gbp
                    and rec.get("ref_queries") == n_ref
                    and rec.get("method", "and") == args.method
                    and "ref_guides_per_s" in rec):
                cached_rate = rec["ref_guides_per_s"]
    if cached_rate is not None:
        if not refout.exists():      # rate cached by an older run that
            _, out1 = run_ref(q1, repeats=1)   # didn't save the output:
            refout.write_text(out1)            # one run for parity only
        out1 = refout.read_text()
        ref_rate = cached_rate
        results["ref_reused"] = True
        log(f"reference (cached): {ref_rate:,.0f} guides/s")
    else:
        run_ref(q1, repeats=1)       # warm the .issl page cache
        t1, out1 = run_ref(q1)
        t5, _ = run_ref(q5)
        refout.write_text(out1)
        ref_rate = 4 * n_ref / max(t5 - t1, 1e-9)
        log(f"reference: t(N)={t1:.0f}s t(5N)={t5:.0f}s -> {ref_rate:,.0f} "
            f"guides/s")
    results["ref_guides_per_s"] = round(ref_rate, 1)

    # parity at scale: full-scan engines report complete sums where the
    # reference freezes early-exit partials for REJECTED guides (PARITY
    # Tier 3), so measure verdict agreement plus accepted-score agreement
    from crackling_tpu.ops.issl_jax import verdicts

    lines = out1.strip().split("\n")
    ref_mit = np.array([float(l.split("\t")[1]) for l in lines])
    ref_cfd = np.array([float(l.split("\t")[2]) for l in lines])
    ref_ok = verdicts(ref_mit, ref_cfd, 75.0, args.method)

    # each engine (comma-separated) scores on the one uploaded dataset;
    # a fresh process per engine would repay the index load + h2d upload
    # (minutes at mammal scale) every time
    import gc

    for engine_name in args.engine.split(","):
        res = dict(results)
        res["engine"] = engine_name
        mit, cfd = time_engine(engine_name, res)
        res["vs_baseline"] = round(res["ours_guides_per_s"] / ref_rate, 2)
        log(f"[{engine_name}] ratio {res['vs_baseline']}x")
        our_mit = mit[: len(ref_mit)]
        our_cfd = cfd[: len(ref_mit)]
        our_ok = verdicts(our_mit, our_cfd, 75.0, args.method)
        verdict_agree = float(np.mean(ref_ok == our_ok))
        acc = ref_ok & our_ok
        score_agree = float(np.mean(
            (np.abs(our_mit[acc] - ref_mit[acc]) < 2e-2)
            & (np.abs(our_cfd[acc] - ref_cfd[acc]) < 2e-2))) \
            if acc.any() else 1.0
        res["verdict_agreement"] = verdict_agree
        res["accepted_score_agreement"] = score_agree
        log(f"[{engine_name}] verdict agreement: {verdict_agree:.4f}; "
            f"accepted-score agreement: {score_agree:.4f} "
            f"({int(acc.sum())} accepted)")
        with open(ROOT / "scripts" / "scale_rung_results.jsonl", "a") as fp:
            fp.write(json.dumps(res) + "\n")
        print(json.dumps(res))
        gc.collect()    # drop the engine's device arrays before the next


if __name__ == "__main__":
    main()
