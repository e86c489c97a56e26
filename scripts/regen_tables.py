"""Regenerate the published performance tables from the measurement records.

VERDICT r3 and r4 both caught the hand-maintained README/BASELINE tables
lagging the repo's own jsonl evidence (a load-corrupted 58.4 guides/s
mouse baseline survived two rounds as a ~317x headline). This script
makes the published record a pure function of the records:

* ladder rows come from the LATEST entry per (rung, engine) in
  ``scripts/scale_rung_results.jsonl``;
* the deep-rung (2.6/3.1 Gbp) reference baselines come from the
  controlled interleaved study (``baseline_study_results.jsonl`` —
  best-of-rounds with load recorded), not ad-hoc single timings;
* the bench-point row comes from the newest ``BENCH_r*.json``.

It rewrites the blocks between ``<!-- BEGIN GENERATED: perf-ladder -->``
/ ``<!-- END GENERATED: perf-ladder -->`` markers in README.md and
BASELINE.md. Run after any measurement lands:

    python scripts/regen_tables.py        # rewrite in place
    python scripts/regen_tables.py --check   # CI mode: fail if stale
"""

import argparse
import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

RUNG_NAMES = {
    0.0046: ("E. coli scale (4.6 Mbp)", "E. coli (4.6 Mbp)"),
    0.012: ("S. cerevisiae scale (12 Mbp)", "yeast (12 Mbp)"),
    0.14: ("D. melanogaster scale (140 Mbp)", "fly (140 Mbp)"),
    1.0: ("crossover sweep (1.0 Gbp)", "mid-depth (1.0 Gbp, sweep)"),
    2.6: ("mouse scale (2.6 Gbp, repeat-rich)", "mouse (2.6 Gbp, repeat-rich)"),
    3.1: ("human scale (3.1 Gbp)", "human (3.1 Gbp)"),
}
DEEP_RUNGS = (2.6, 3.1)


def load_jsonl(path):
    p = ROOT / "scripts" / path
    if not p.exists():
        return []
    return [json.loads(l) for l in p.read_text().splitlines() if l.strip()]


def latest_rung_rows():
    """{gbp: {engine: record}} — the latest record per (rung, engine),
    method='and' only (the ladder's operating point)."""
    rows = {}
    for rec in load_jsonl("scale_rung_results.jsonl"):
        if rec.get("method", "and") != "and":
            continue
        gbp = rec.get("genome_gbp")
        eng = rec.get("engine", "pallas")
        if rec.get("hybrid_fast"):
            eng = f"hybrid-{rec['hybrid_fast']}"
        if gbp not in RUNG_NAMES:
            continue
        rows.setdefault(gbp, {})[eng] = rec   # later lines overwrite
    return rows


def controlled_baselines():
    """Deep-rung reference baselines from the interleaved study:
    {gbp: (best, median, date)}. Uses the latest study record."""
    recs = load_jsonl("baseline_study_results.jsonl")
    if not recs:
        return {}
    rec = recs[-1]
    out = {}
    for gbp in DEEP_RUNGS:
        key = f"g{gbp:g}b_best"
        if key in rec:
            out[gbp] = (rec[key], rec.get(f"g{gbp:g}b_median"),
                        rec.get("date"))
    return out


def latest_bench():
    paths = sorted(glob.glob(str(ROOT / "BENCH_r*.json")))
    if not paths:
        return None
    rec = json.loads(Path(paths[-1]).read_text())
    rec = rec.get("parsed", rec)   # driver artifacts nest the JSON line
    if "value" not in rec:
        return None
    rec["_round"] = Path(paths[-1]).stem.split("_r")[-1]
    return rec


def fmt_rate(x):
    if x is None:
        return "—"
    if x >= 10000:
        return f"{x / 1000:,.0f} K"
    if x >= 1000:
        return f"{x:,.0f}"
    return f"{x:,.1f}" if x < 100 else f"{x:,.0f}"


def baseline_of(gbp, recs, controlled):
    """(rate, label): the controlled-study best for deep rungs, the
    same-day jsonl baseline otherwise."""
    if gbp in controlled:
        best, med, date = controlled[gbp]
        return best, f"{best:,.0f} (controlled study best; median {med:,.0f})"
    # shallow rungs: the latest same-day reference timing of any engine row
    rates = [r.get("ref_guides_per_s") for r in recs.values()
             if r.get("ref_guides_per_s")]
    if not rates:
        return None, "—"
    rate = rates[-1]
    return rate, fmt_rate(rate)


def build_ladder_table():
    rungs = latest_rung_rows()
    controlled = controlled_baselines()
    lines = [
        "| Genome scale | distinct sites | best engine (1 chip) | "
        "pipeline path (hybrid) | reference (4 cores) | best ratio |",
        "|---|---|---|---|---|---|",
    ]
    for gbp in sorted(rungs):
        recs = rungs[gbp]
        name = RUNG_NAMES[gbp][1]
        sites = max(r.get("distinct_sites", 0) for r in recs.values())
        fast = {e: r for e, r in recs.items()
                if not e.startswith("hybrid")}
        best_eng, best = max(
            ((e, r) for e, r in fast.items()),
            key=lambda kv: kv[1].get("ours_guides_per_s", 0))
        hyb = {e: r for e, r in recs.items() if e.startswith("hybrid")}
        hyb_cell = "—"
        if hyb:
            he, hr = max(hyb.items(),
                         key=lambda kv: kv[1].get("ours_guides_per_s", 0))
            hyb_cell = (f"{fmt_rate(hr['ours_guides_per_s'])} "
                        f"({he.split('-')[1]}+re-score)")
        ref_rate, ref_label = baseline_of(gbp, recs, controlled)
        ratio = (f"**{best['ours_guides_per_s'] / ref_rate:,.1f}x**"
                 if ref_rate else "—")
        sites_s = f"{sites / 1e6:.1f} M" if sites >= 1e6 else f"{sites / 1e3:.0f} K"
        lines.append(
            f"| {name} | {sites_s} | "
            f"{fmt_rate(best['ours_guides_per_s'])} ({best_eng}) | "
            f"{hyb_cell} | {ref_label} | {ratio} |")
    return "\n".join(lines)


def build_bench_note():
    rec = latest_bench()
    if rec is None:
        return ""
    extra = ""
    if "ours_dispersion" in rec:
        extra = (f" (best-two dispersion ours "
                 f"{rec['ours_dispersion']:.1%} / reference "
                 f"{rec['ref_dispersion']:.1%}, interleaved rounds)")
    return (
        f"Driver-recorded bench point (`BENCH_r{rec['_round']}.json`, "
        f"27 Mbp / 5.06 M sites / 64 K queries): "
        f"**{rec['value']:,.0f} guides/s/chip, "
        f"{rec['vs_baseline']:,.1f}x** the reference on the same host"
        + extra + ".")


MARK = ("<!-- BEGIN GENERATED: perf-ladder -->",
        "<!-- END GENERATED: perf-ladder -->")


def generated_block():
    controlled = controlled_baselines()
    note = ""
    if controlled:
        date = next(iter(controlled.values()))[2]
        note = (
            "\nDeep-rung reference baselines are from the controlled "
            f"interleaved study of {date} "
            "(`scripts/baseline_study_results.jsonl`: 3 rounds "
            "alternating mouse/human with host load recorded; best round "
            "quoted, so the ratios are conservative). Earlier ad-hoc "
            "deep-rung baselines (58.4 and 6.1 guides/s) were "
            "load-corrupted and are superseded.\n")
    parts = [MARK[0],
             "<!-- Generated by scripts/regen_tables.py — edit the jsonl "
             "records, not this block. -->",
             "", build_ladder_table(), note]
    bench = build_bench_note()
    if bench:
        parts.append(bench)
    parts.append(MARK[1])
    return "\n".join(parts)


def splice(path, block):
    text = path.read_text()
    pat = re.compile(re.escape(MARK[0]) + r".*?" + re.escape(MARK[1]),
                     re.DOTALL)
    if not pat.search(text):
        raise SystemExit(f"{path}: no generated-block markers")
    new = pat.sub(lambda _: block, text)
    return text, new


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="fail (exit 1) if any published table is stale")
    args = ap.parse_args()
    block = generated_block()
    stale = []
    for name in ("README.md", "BASELINE.md"):
        path = ROOT / name
        old, new = splice(path, block)
        if old != new:
            if args.check:
                stale.append(name)
            else:
                path.write_text(new)
                print(f"updated {name}")
        else:
            print(f"{name} up to date")
    if stale:
        print(f"STALE: {', '.join(stale)} — run scripts/regen_tables.py")
        sys.exit(1)


if __name__ == "__main__":
    main()
