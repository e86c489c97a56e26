"""Sweep the dense engine's query page size on the bench query set.

With device-side planning the per-page upload is 8 bytes/query, so the
optimal page is set by kernel occupancy (qb grows with page size,
amortizing each entry tile's one-hot unpack over more matmul columns)
vs the single-page tail. Prints one line per page size; appends a JSON
record to scripts/page_sweep_results.jsonl.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    from bench import ensure_dataset
    from crackling_tpu.codec import strings_to_sigs
    from crackling_tpu.index import load_native
    from crackling_tpu.ops.issl_dense import DenseIsslScorer

    index_npz, _issl, qfile = ensure_dataset()
    index = load_native(str(index_npz))
    sigs = strings_to_sigs([s.strip() for s in open(qfile)], 20)
    n = len(sigs)

    results = {"n_queries": n}
    for page in [8192, 16384, 32768, 65536]:
        sc = DenseIsslScorer(index, query_page=page)
        sc.score(sigs)                      # compile + warm
        t = min((lambda t0: (sc.score(sigs), time.time() - t0)[1])(
            time.time()) for _ in range(3))
        results[f"page_{page}"] = round(n / t, 1)
        print(f"page {page:6d}: {t:.3f} s -> {n / t:,.0f} guides/s",
              flush=True)
    with open(ROOT / "scripts" / "page_sweep_results.jsonl", "a") as fp:
        fp.write(json.dumps(results) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
