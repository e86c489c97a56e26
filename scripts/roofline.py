"""Roofline accounting for the compact/dense engines at the bench point.

VERDICT r4 item 6: give the headline an efficiency denominator. For a
measured page rate this script computes what the page *moves and
multiplies*, and compares against the chip's peaks:

* **HBM bytes/page**: the kernels stream the three packed entry planes
  (lo, hi, occ — 12 B per padded site-slice entry) exactly once per
  query page, plus the per-bucket weight blocks and the moment output.
* **MXU MACs/page**: the mask matmul contracts the 128-sublane one-hot
  decomposition against qb weight columns per 128-site lane group —
  128 x qb MACs per padded entry (the dense engine runs 5 such matmuls:
  mask, mit hi/lo, cfd hi/lo).
* **VPU ops/page**: the one-hot unpack builds a (128, 128) code-compare
  tile per lane group (~6 elementwise ops per cell) — this is the term
  that dominates the kernel in practice.

v5e peaks (public spec): 394 bf16 TFLOP/s, 819 GB/s HBM; VPU ~ 8x128
lanes x 4 ALUs x 940 MHz ~ 3.9 Tops/s.

Usage:
    python scripts/roofline.py --rate 295000 [--qb 384]
Appends a record to scripts/roofline_results.jsonl and prints it.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

PEAK_BF16_FLOPS = 394e12
PEAK_HBM_BPS = 819e9
PEAK_VPU_OPS = 3.9e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=str(ROOT / "bench_data" / "g27m.index.npz"))
    ap.add_argument("--rate", type=float, required=True,
                    help="measured guides/s at this operating point")
    ap.add_argument("--page", type=int, default=65536)
    ap.add_argument("--qb", type=int, default=None,
                    help="padded per-bucket query occupancy (default: "
                         "recomputed from the bench query file)")
    ap.add_argument("--engine", default="compact",
                    choices=("compact", "dense"))
    args = ap.parse_args()

    from crackling_tpu.index import load_native
    from crackling_tpu.ops.issl_dense import ALIGN, plan_query_occupancy

    index = load_native(args.index)
    lens = np.diff(index.bucket_offsets, axis=1)
    alens = -(-lens // ALIGN) * ALIGN
    epad = int(alens.sum(axis=1).max()) + 4096
    epad = -(-epad // ALIGN) * ALIGN
    S = index.slice_count

    qb = args.qb
    if qb is None:
        qfile = ROOT / "bench_data" / f"g27m.queries{args.page}.txt"
        if qfile.exists():
            from crackling_tpu.codec import strings_to_sigs

            sigs = strings_to_sigs(qfile.read_text().split()[: args.page], 20)
            qb, _ = plan_query_occupancy(sigs, S, index.bucket_count, 8,
                                         1 << 20)
        else:
            qb = -(-int(args.page / index.bucket_count * 1.3) // 64) * 64
    entries = S * epad                      # padded site-slice entries

    page_s = args.page / args.rate
    hbm_bytes = entries * 12                # 3 u32 planes, streamed once
    n_matmuls = 1 if args.engine == "compact" else 5
    macs = entries * 128 * qb * n_matmuls
    flops = 2 * macs
    vpu_ops = entries * 128 * 6             # one-hot unpack tile work

    rec = {
        "engine": args.engine,
        "index": Path(args.index).name,
        "distinct_sites": int(index.num_sites),
        "epad": epad,
        "qb": int(qb),
        "page": args.page,
        "measured_guides_per_s": args.rate,
        "page_seconds": round(page_s, 4),
        "hbm_gb_per_page": round(hbm_bytes / 1e9, 3),
        "hbm_gbps_achieved": round(hbm_bytes / page_s / 1e9, 2),
        "hbm_utilization": round(hbm_bytes / page_s / PEAK_HBM_BPS, 4),
        "mxu_tflops_per_page": round(flops / 1e12, 3),
        "mxu_utilization": round(flops / page_s / PEAK_BF16_FLOPS, 4),
        "vpu_utilization_est": round(vpu_ops / page_s / PEAK_VPU_OPS, 4),
        "bound": None,
    }
    utils = {"hbm": rec["hbm_utilization"], "mxu": rec["mxu_utilization"],
             "vpu": rec["vpu_utilization_est"]}
    rec["bound"] = max(utils, key=utils.get)
    with open(ROOT / "scripts" / "roofline_results.jsonl", "a") as fp:
        fp.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
