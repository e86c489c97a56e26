"""Compact two-phase dense engine: mask matmul -> hit moments -> sparse scoring.

Fourth-generation TPU engine (VERDICT r2 next-step 2). The dense engine
(ops/issl_dense.py) pays its page time ~0.05 s matmul / ~0.12 s VPU
epilogue / ~0.04 s DMA: the epilogue computes the full MIT/CFD arithmetic
(two exp2s, a divide, ctz/clz) for EVERY (entry, query-slot) pair even
though hits — pairs within max_dist (isslScoreOfftargets.cpp:382) — are
a tiny fraction of pairs on real indexes. This engine splits the work:

* **Phase 1 (pallas kernel)**: the dense engine's packed-plane layout,
  DMA pipeline and one-hot unpack, but only the *mask* matmul (one dot
  instead of five). From the exact mismatch mask: Hamming distance
  (popcount), the first-clean-slice dedup test (SWAR, the stateless
  equivalent of the reference's seen-bitvector,
  isslScoreOfftargets.cpp:385-387), and bucket bounds give the hit
  predicate; the only outputs are per-(4096-entry chunk, query slot)
  hit **count and rank-sum moments** (the compaction idea of
  ops/issl_mxu.py's kernel, held at chunk granularity so the kernel
  does ONE pair of sublane reductions per chunk and the decode's
  nonzero domains stay small; a single-hit chunk's rank-sum IS the
  hit's in-bucket rank, exact in f32 below 2^22).
* **Phase 2 (XLA, same device)**: moment decode — single-hit slots
  resolve directly; multi-hit slots expand down a **moment tree**:
  on deep indexes the kernel also emits per-*superchunk* (~sqrt(nch)
  chunks) moments, so a multi-hit slot first expands into its few
  superchunk cells, single-hit superchunk cells resolve directly, and
  only multi-hit superchunk cells expand into their chunk cells —
  the expansion per slot is O(sqrt(depth)) instead of O(depth), which
  is what keeps the decode flat at mammal-genome bucket depth (the
  round-3 collapse: a 64K-slot page at ~1,000-chunk depth gathered
  ~250M chunk cells; the tree gathers ~4M). Shallow indexes skip the
  level (identical to the two-level decode). Single-hit cells resolve
  directly; multi-hit chunks are **rescanned inline** in memory-bounded
  row blocks: their <=4096 packed entries are gathered and the hit
  predicate plus per-pair MIT/CFD are evaluated elementwise and
  row-summed in one fused pass (extracting the sparse hits first costs
  a pairs-sized flat cumsum that measured 3x slower). Point hits
  elsewhere in the decode recompute the mismatch mask from the packed
  signatures; MIT uses the closed form (isslCreateIndex.cpp:93-118),
  CFD the exact 320-entry penalty-table product (cfdPenalties.h), both
  in plain f32 (no bf16 split — per-hit arithmetic is cheap), and a
  segment-sum by query id yields the page's MIT/CFD sums. Only
  2 x page x 4 B of sums (plus an 8-int header for the
  compaction-cap check) return to host.

In-kernel dedup means each (query, site) hit decodes exactly once, so
phase 2 needs no sort/unique. dist == 0 self-hits are ordinary hits
here (CFD += occ, MIT += 0, the reference's dist-0 semantics,
isslScoreOfftargets.cpp:393,407-408); padding query slots carry an
all-positions mask weight row so every pair they touch reads dist 20
and never flags.

Full-scan semantics like the dense engine: verdicts exact for
mit/cfd/and/or; wrap in ops/issl_dense.HybridIsslScorer for
reference-exact verdicts on all five methods.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import sig_split
from ..index.build import IsslIndex
from ..utils.jaxcache import enable_persistent_cache
from .issl_dense import ALIGN, LANES, plan_query_occupancy
from .tables import (CFD_PAM_NGG_INDEX, MIT_WEIGHTS, cfd_pam_penalties,
                     cfd_pos_penalties)

enable_persistent_cache()

# debug/ablation knob: 1 = direct (1-2 hit) slots only, 2 = + tree
# cells, 3 = full decode (default). Read at trace time.
_STAGES = 3

# min-rank sentinel for empty cells; ranks are exact below 2^22 so the
# sentinel is unreachable
RANK_SENTINEL = float(1 << 23)


def auto_superchunk(nchmax: int) -> int:
    """Superchunk size (chunks per superchunk) for a given moment-plane
    depth: 0 (level disabled) while the direct slot->chunk expansion is
    cheap, ~sqrt(depth) once it is not, so both tree levels expand
    O(sqrt(depth)) cells."""
    if nchmax <= 64:
        return 0
    return max(8, 4 * int(round(float(np.sqrt(nchmax)) / 4.0)))


def normalize_caps(caps, nz_cap: int):
    """Seven compaction capacities (direct 1-2 hit slots, >=3-hit
    slots, nonzero superchunk cells, >=3-hit superchunk cells, nonzero
    chunk cells, >=3-hit rescan chunks, unused legacy slot). Legacy
    4-tuples (pre-superchunk) map their cell/rescan caps onto the
    superchunk level; 6-tuples are padded with the unused slot."""
    if caps is None:
        nz = int(nz_cap)
        caps = (nz, max(1024, nz // 2), max(2048, nz),
                max(1024, nz // 4), max(2048, nz), max(1024, nz // 4))
    caps = tuple(int(c) for c in caps)
    if len(caps) == 4:
        c1, cm, c2, cr = caps
        caps = (c1, cm, c2, cr, c2, cr)
    if len(caps) == 6:
        caps = caps + (4 * caps[5],)
    if len(caps) != 7:
        raise ValueError("caps must have 4/6 (legacy) or 7 entries")
    return caps


def _quant_cap(pop: int, floor: int = 4096) -> int:
    """Smallest multiple of 4096 >= 1.25x the measured population
    (>= floor): the auto-tuned compaction capacity for a population.
    Every decode gather/score runs at cap size, so quantization waste
    is throughput lost — the earlier power-of-two-at-1.5x rule gave a
    5.6K rescan population a 16K cap (2.9x the work; the rescan is 40%
    of the bench-point page, profile_compact_results.jsonl). The 4096
    grain still absorbs page-to-page population jitter (measured <10%
    at fixed operating points) without recompiles; a page that does
    overflow grows its cap and retries like before."""
    need = max(floor, int(1.25 * pop) + 1)
    return -(-need // 4096) * 4096


def _compact_indices(mask, cap: int):
    """Indices of True elements (first ``cap``, -1 fill) via exclusive
    cumsum + bounded scatter — jnp.nonzero(size=) costs ~2x this on TPU."""
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < cap), pos, cap)
    iota = jnp.arange(mask.shape[0], dtype=jnp.int32)
    return jnp.full(cap + 1, -1, jnp.int32).at[tgt].set(
        iota, mode="drop")[:cap]


def _moment_tail(mom_ref, carry, c, nch, cnt1, pos1, rmin1, rmax1,
                 *, qb: int, nblk: int, nsb: int, superchunk: int):
    """Shared finder tail: fold one chunk's (count, global-rank-sum,
    min rank, max rank) quad — each (1, qb) f32, ranks already global —
    into the 2-chunk block register, the bucket totals, and (when the
    tree level is on) the superchunk registers; store blocks at their
    boundaries. Both finder kernels (packed-unpack and one-hot-plane)
    produce identical moments, so they share this tail verbatim."""
    from jax.experimental import pallas as pl

    big = jnp.float32(RANK_SENTINEL)
    if superchunk:
        blk, tot, tmin, tmax, scblk, scc, scp, scmin, scmax = carry
    else:
        blk, tot, tmin, tmax = carry

    # pack 2 chunks' (cnt, pos, min, max) quads per 8-row block: Mosaic
    # vector stores need sublane-aligned (multiple-of-8) dynamic
    # offsets, so the block accumulates in registers and stores once per
    # 2 chunks (or at the bucket's last chunk) — the min/max pair is
    # what lets the decode resolve 1-2 hit cells pointwise and skip the
    # rescan for them entirely
    k = c % 2
    # row-iota selects (Mosaic has no register-value
    # dynamic_update_slice): blk[4k..4k+3] = cnt,pos,min,max
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, qb), 0)

    def put4(reg, base_row, c_, p_, mn_, mx_):
        reg = jnp.where(rows8 == base_row,
                        jnp.broadcast_to(c_, (8, qb)), reg)
        reg = jnp.where(rows8 == base_row + 1,
                        jnp.broadcast_to(p_, (8, qb)), reg)
        reg = jnp.where(rows8 == base_row + 2,
                        jnp.broadcast_to(mn_, (8, qb)), reg)
        return jnp.where(rows8 == base_row + 3,
                         jnp.broadcast_to(mx_, (8, qb)), reg)

    blk = put4(blk, 4 * k, cnt1, pos1, rmin1, rmax1)
    # bucket totals (rows 0-3 of the last block): 1-2 hit slots
    # resolve from these alone, so the decode never reduces over
    # the full chunk-moment planes
    tot = tot + jnp.where(rows8 == 0,
                          jnp.broadcast_to(cnt1, (8, qb)),
                          jnp.where(rows8 == 1,
                                    jnp.broadcast_to(pos1, (8, qb)),
                                    jnp.zeros((8, qb), jnp.float32)))
    tmin = jnp.minimum(tmin, rmin1)
    tmax = jnp.maximum(tmax, rmax1)

    @pl.when((k == 1) | (c == nch - 1))
    def _():
        mom_ref[0, 0, pl.ds(8 * (c // 2), 8), :] = blk

    @pl.when(c == nch - 1)
    def _():
        mom_ref[0, 0, pl.ds(8 * (nblk + nsb), 8), :] = put4(
            tot, 0, tot[0:1], tot[1:2], tmin, tmax)

    new_blk = jnp.where(k == 1, jnp.zeros_like(blk), blk)
    if not superchunk:
        return (new_blk, tot, tmin, tmax)

    # superchunk moments: the middle tree level. Accumulate the
    # chunk's quad into the running superchunk registers; at a
    # superchunk boundary fold them into the 2-superchunk block
    # register and store the block when full (rows
    # [8*nblk, 8*(nblk+nsb)), after the chunk blocks, before totals)
    scc = scc + cnt1
    scp = scp + pos1
    scmin = jnp.minimum(scmin, rmin1)
    scmax = jnp.maximum(scmax, rmax1)
    j = c // superchunk
    ksc = j % 2
    at_end = ((c + 1) % superchunk == 0) | (c == nch - 1)
    folded = put4(scblk, 4 * ksc, scc, scp, scmin, scmax)
    scblk = jnp.where(at_end, folded, scblk)
    store_sc = at_end & ((ksc == 1) | (c == nch - 1))

    @pl.when(store_sc)
    def _():
        mom_ref[0, 0, pl.ds(8 * (nblk + j // 2), 8), :] = scblk

    scc = jnp.where(at_end, jnp.zeros_like(scc), scc)
    scp = jnp.where(at_end, jnp.zeros_like(scp), scp)
    scmin = jnp.where(at_end, jnp.full_like(scmin, big), scmin)
    scmax = jnp.where(at_end, jnp.full_like(scmax, -1.0), scmax)
    scblk = jnp.where(store_sc, jnp.zeros_like(scblk), scblk)
    return (new_blk, tot, tmin, tmax, scblk, scc, scp, scmin, scmax)


def _moment_init(qb: int, superchunk: int):
    """The fori_loop carry both finder kernels thread through
    :func:`_moment_tail`."""
    big = jnp.float32(RANK_SENTINEL)
    init = (jnp.zeros((8, qb), jnp.float32),
            jnp.zeros((8, qb), jnp.float32),
            jnp.full((1, qb), big, jnp.float32),
            jnp.full((1, qb), -1.0, jnp.float32))
    if superchunk:
        init = init + (jnp.zeros((8, qb), jnp.float32),
                       jnp.zeros((1, qb), jnp.float32),
                       jnp.zeros((1, qb), jnp.float32),
                       jnp.full((1, qb), big, jnp.float32),
                       jnp.full((1, qb), -1.0, jnp.float32))
    return init


def _finder_kernel(boff_ref, blen_ref, wts_ref, entries_hbm, mom_ref,
                   buf, sems, *, chunk: int, qb: int, nchmax: int,
                   max_dist: int, rows_per_slice: int, superchunk: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cg = chunk // LANES
    s = pl.program_id(0)
    v = pl.program_id(1)
    b0 = boff_ref[s, v]
    blen = blen_ref[s, v]
    nch = pl.cdiv(blen, jnp.int32(chunk))
    row_base = s * rows_per_slice + b0 // LANES

    wm = wts_ref[0, 0]                        # (128, qb) bf16 mask weights

    def dma(slot, c):
        r0 = pl.multiple_of(row_base + c * cg, ALIGN // LANES)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(r0, cg), :], buf.at[slot],
            sems.at[slot])

    nblk = -(-nchmax // 2)
    nsb = -(-(-(-nchmax // superchunk)) // 2) if superchunk else 0
    mom_ref[0, 0] = jnp.zeros((8 * (nblk + nsb + 1), qb), jnp.float32)
    big = jnp.float32(RANK_SENTINEL)

    @pl.when(blen > 0)
    def _process():
        dma(0, 0).start()

        # one-hot sublane decomposition (identical to the dense kernel)
        j = jax.lax.broadcasted_iota(jnp.uint32, (LANES, LANES), 0)
        jp = j >> 2
        jb = j & 3
        sh = (jp * 2) % 32
        use_hi = jp >= 16
        site_sub = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
        low_mask = (jnp.uint32(1) << (4 * s)) - jnp.uint32(1)
        cdims = (((0,), (0,)), ((), ()))

        def body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()

            lo2 = buf[slot, 0]                       # (cg, 128) u32
            hi2 = buf[slot, 1]

            cnt_acc = jnp.zeros((LANES, qb), jnp.float32)
            pos_acc = jnp.zeros((LANES, qb), jnp.float32)
            min_acc = jnp.full((LANES, qb), big, jnp.float32)
            max_acc = jnp.full((LANES, qb), -1.0, jnp.float32)
            for g in range(cg):
                lo_b = jnp.broadcast_to(lo2[g:g + 1, :], (LANES, LANES))
                hi_b = jnp.broadcast_to(hi2[g:g + 1, :], (LANES, LANES))
                word = jnp.where(use_hi, hi_b, lo_b)
                code = (word >> sh) & jnp.uint32(3)
                e = (code == jb).astype(jnp.bfloat16)   # (onehot, site)

                maskf = jax.lax.dot_general(
                    e, wm, cdims, preferred_element_type=jnp.float32)
                mi_raw = maskf.astype(jnp.int32)        # (128 site, qb)
                dist = jax.lax.population_count(mi_raw)
                x = mi_raw.astype(jnp.uint32) | ~low_mask
                seen_earlier = ((x - jnp.uint32(0x11111111)) & ~x
                                & jnp.uint32(0x88888888)) != 0
                in_bucket = (site_sub + (g * LANES) + c * chunk) < blen
                valid = (dist <= max_dist) & ~seen_earlier & in_bucket

                hitf = valid.astype(jnp.float32)        # (128, qb)
                rank = (site_sub + (g * LANES)).astype(jnp.float32)
                cnt_acc = cnt_acc + hitf
                pos_acc = pos_acc + hitf * rank
                min_acc = jnp.minimum(min_acc, jnp.where(valid, rank, big))
                max_acc = jnp.maximum(max_acc, jnp.where(valid, rank, -1.0))

            # one reduction per component per chunk: 128 sublanes -> 1 row
            # (two-step 128->8->1 keeps the reduce in Mosaic's happy path)
            cf = jnp.float32(c * chunk)
            cnt8 = jnp.sum(cnt_acc.reshape(LANES // 8, 8, qb), axis=0)
            pos8 = jnp.sum((pos_acc + cnt_acc * cf)
                           .reshape(LANES // 8, 8, qb), axis=0)
            min8 = jnp.min(min_acc.reshape(LANES // 8, 8, qb), axis=0)
            max8 = jnp.max(max_acc.reshape(LANES // 8, 8, qb), axis=0)
            cnt1 = jnp.sum(cnt8, axis=0, keepdims=True)       # (1, qb)
            pos1 = jnp.sum(pos8, axis=0, keepdims=True)
            min1 = jnp.min(min8, axis=0, keepdims=True)
            max1 = jnp.max(max8, axis=0, keepdims=True)
            # global ranks; the sentinel (no hit) stays put
            rmin1 = jnp.where(min1 < big, min1 + cf, big)
            rmax1 = jnp.where(max1 >= 0.0, max1 + cf, -1.0)
            return _moment_tail(mom_ref, carry, c, nch, cnt1, pos1,
                                rmin1, rmax1, qb=qb, nblk=nblk, nsb=nsb,
                                superchunk=superchunk)

        jax.lax.fori_loop(0, nch, body, _moment_init(qb, superchunk))


def _finder_kernel_onehot(boff_ref, blen_ref, wts_ref, planes_hbm, mom_ref,
                          buf, sems, *, chunk: int, qb: int, nchmax: int,
                          max_dist: int, superchunk: int):
    """The finder over PRECOMPUTED int8 one-hot planes (S, Epad, 128).

    Identical moments to :func:`_finder_kernel`, different input layout:
    the one-hot rows stream from HBM (128 B per site-slice, the MXU
    engine's plane layout) and the whole chunk is ONE
    (chunk, 128) x (128, qb) mask matmul — no VPU unpack loop. Measured
    at the 64K-query bench point this is throughput-NEUTRAL (411K vs
    the packed kernel's 421K guides/s): with tuned caps, kernel time is
    dominated by the per-(entry, query-slot) hit-predicate plane
    (popcount/SWAR/compare + the moment reductions over (chunk, qb)),
    which both variants share — the unpack the planes eliminate was
    already overlapped. The variant is kept (default OFF,
    ``onehot=True`` or the CRACKLING_TPU_COMPACT_ONEHOT env var)
    because at small query pages qb shrinks, the predicate plane
    shrinks with it, and the qb-independent unpack becomes the bound —
    the latency-sensitive regime. Planes cost 128 B/site/slice of HBM
    and must fit the CRACKLING_TPU_COMPACT_PLANE_BUDGET."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = pl.program_id(0)
    v = pl.program_id(1)
    b0 = boff_ref[s, v]
    blen = blen_ref[s, v]
    nch = pl.cdiv(blen, jnp.int32(chunk))

    wm = wts_ref[0, 0]                        # (128, qb) bf16 mask weights

    def dma(slot, c):
        r0 = pl.multiple_of(b0 + c * chunk, ALIGN)
        return pltpu.make_async_copy(
            planes_hbm.at[s, pl.ds(r0, chunk), :], buf.at[slot],
            sems.at[slot])

    nblk = -(-nchmax // 2)
    nsb = -(-(-(-nchmax // superchunk)) // 2) if superchunk else 0
    mom_ref[0, 0] = jnp.zeros((8 * (nblk + nsb + 1), qb), jnp.float32)
    big = jnp.float32(RANK_SENTINEL)

    @pl.when(blen > 0)
    def _process():
        dma(0, 0).start()
        site_sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        low_mask = (jnp.uint32(1) << (4 * s)) - jnp.uint32(1)

        def body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()
            e = buf[slot].astype(jnp.bfloat16)        # (chunk, 128)
            maskf = jax.lax.dot_general(
                e, wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (chunk, qb)
            mi_raw = maskf.astype(jnp.int32)
            dist = jax.lax.population_count(mi_raw)
            x = mi_raw.astype(jnp.uint32) | ~low_mask
            seen_earlier = ((x - jnp.uint32(0x11111111)) & ~x
                            & jnp.uint32(0x88888888)) != 0
            in_bucket = (site_sub + c * chunk) < blen
            valid = (dist <= max_dist) & ~seen_earlier & in_bucket

            hitf = valid.astype(jnp.float32)          # (chunk, qb)
            rank = site_sub.astype(jnp.float32)
            cf = jnp.float32(c * chunk)
            cnt8 = jnp.sum(hitf.reshape(chunk // 8, 8, qb), axis=0)
            pos8 = jnp.sum((hitf * (rank + cf))
                           .reshape(chunk // 8, 8, qb), axis=0)
            min8 = jnp.min(jnp.where(valid, rank, big)
                           .reshape(chunk // 8, 8, qb), axis=0)
            max8 = jnp.max(jnp.where(valid, rank, -1.0)
                           .reshape(chunk // 8, 8, qb), axis=0)
            cnt1 = jnp.sum(cnt8, axis=0, keepdims=True)       # (1, qb)
            pos1 = jnp.sum(pos8, axis=0, keepdims=True)
            min1 = jnp.min(min8, axis=0, keepdims=True)
            max1 = jnp.max(max8, axis=0, keepdims=True)
            rmin1 = jnp.where(min1 < big, min1 + cf, big)
            rmax1 = jnp.where(max1 >= 0.0, max1 + cf, -1.0)
            return _moment_tail(mom_ref, carry, c, nch, cnt1, pos1,
                                rmin1, rmax1, qb=qb, nblk=nblk, nsb=nsb,
                                superchunk=superchunk)

        jax.lax.fori_loop(0, nch, body, _moment_init(qb, superchunk))


class CompactIsslScorer:
    """Single-chip compact two-phase ISSL scorer (full-scan, f32 tier)."""

    # Near-threshold re-score band advertised to HybridIsslScorer: the
    # half-width (score units) within which f32 rounding could flip a
    # threshold comparison. Per-hit arithmetic here is plain f32 with no
    # bf16 matmul in the score path (the matmul only builds the integer
    # mismatch mask, which is exact), and the largest compact-vs-binary
    # score deviation measured across the ladder — E. coli through the
    # 2.6/3.1 Gbp rungs (scripts/scale_rung_results.jsonl, scale
    # accuracy study) — is ~1e-4. 0.05 is a 500x margin; it keeps the
    # hybrid's exact re-score set near-empty at mammal depth, where the
    # dense engine's 1.0 band floods the host re-scorer (VERDICT r4
    # weak #1).
    score_band = 0.05

    def __init__(self, index: IsslIndex, max_dist: int | None = None,
                 query_page: int = 65536, chunk: int = 4096,
                 qb_cap: int = 512, nz_cap: int = 1 << 17,
                 caps: tuple | None = None,
                 superchunk: int | None = None,
                 rescan_block: int | None = None,
                 auto_caps: bool | None = None,
                 onehot: bool | None = None,
                 interpret: bool | None = None):
        if index.slice_width != 8 or index.seq_length != 20:
            raise ValueError("compact engine supports l=20, w=8")
        if chunk % ALIGN:
            raise ValueError(f"chunk must be a multiple of {ALIGN}")
        self.index = index
        self.max_dist = index.max_dist if max_dist is None else int(max_dist)
        self.query_page = int(query_page)
        self.chunk = int(chunk)
        self.qb_cap = int(qb_cap)
        # compaction capacities: every decode gather/score runs at cap
        # size, so throughput is CAPACITY-bound, not population-bound.
        # Tuning caps to measured populations lifted the bench point
        # ~204K -> ~293K (round 4, power-of-two caps at 1.5x), and
        # tightening the quantizer to 4096-grain at 1.25x (_quant_cap)
        # lifted it again to a reproducible, interleaved-bench 421K
        # guides/s (round 5) — confirming the stage-ablation profile's
        # finding that the decode (tree cells + rescan) was ~63% of the
        # page at the bench point. ``caps`` pins all seven (direct 1-2
        # hit slots, >=3-hit slots, nonzero superchunk cells, >=3-hit
        # superchunk cells, nonzero chunk cells, >=3-hit rescan chunks,
        # unused) explicitly and overflow splits the page in half; with
        # caps=None on TPU the scorer AUTO-TUNES: the first page runs at
        # the generous nz_cap defaults, caps shrink to ~1.25x its
        # measured populations (4096-grain quantized so recompiles
        # stay rare), and later overflows grow the exceeded cap and
        # retry instead of splitting — see scripts/compact_caps.py
        (self.cap_single, self.cap_mslot, self.cap_scell, self.cap_sresc,
         self.cap_mcell, self.cap_rescan,
         self.cap_hits) = normalize_caps(caps, nz_cap)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if auto_caps is None:
            auto_caps = caps is None and not interpret
        self._auto = bool(auto_caps)
        self._tuned = False
        self.S = index.slice_count
        self.B = index.bucket_count

        arrs = index.device_arrays_aligned(align=ALIGN, tail=self.chunk)
        epad = arrs["list_lo"].shape[1]
        self._rows_per_slice = epad // LANES
        maxblen = int(arrs["bucket_lens"].max())
        # rank sums live in f32: exactness bound, cf. issl_mxu.py:220-229
        if maxblen >= (1 << 22):
            raise ValueError(
                f"bucket with {maxblen:,} entries exceeds the moment "
                "decoder's 2^22 rank-exactness bound")
        self._nchmax = max(1, -(-maxblen // self.chunk))
        self.superchunk = (auto_superchunk(self._nchmax)
                           if superchunk is None else int(superchunk))
        # rescan block: bounds the gathered temporaries at
        # O(rescan_block x chunk) pairs however large cap_rescan is
        # (an unblocked 87K-chunk rescan OOMed a 16 GB chip at mouse
        # depth); the rescan is one fused pass per block, so block size
        # is perf-neutral at the bench point (251K at 8192 vs 247K at
        # 32768) and 8192 keeps live temporaries ~1.3 GB at chunk=4096
        self.rescan_block = (8192 if rescan_block is None
                             else int(rescan_block))
        planes = np.stack([
            arrs["list_lo"].reshape(-1, LANES).view(np.uint32),
            arrs["list_hi"].reshape(-1, LANES).view(np.uint32),
            arrs["list_occ"].reshape(-1, LANES).astype(np.uint32),
        ])
        self.entries = jax.device_put(planes)
        self.bucket_offsets = jax.device_put(arrs["bucket_offsets"])
        self.bucket_lens = jax.device_put(arrs["bucket_lens"])
        # one-hot finder planes (S, Epad, 128) int8: an alternate finder
        # input layout (streamed planes instead of the VPU unpack).
        # Throughput-NEUTRAL at the 64K-page bench point (see the
        # _finder_kernel_onehot docstring), so default OFF; opt in per
        # scorer or via CRACKLING_TPU_COMPACT_ONEHOT=1 for small-page /
        # latency-sensitive workloads. 128 B/site/slice of extra HBM,
        # gated on CRACKLING_TPU_COMPACT_PLANE_BUDGET; the decode
        # always gathers the packed planes either way.
        plane_bytes = self.S * epad * 128
        budget = int(os.environ.get("CRACKLING_TPU_COMPACT_PLANE_BUDGET",
                                    4 << 30))
        if onehot is None:
            onehot = (os.environ.get("CRACKLING_TPU_COMPACT_ONEHOT") == "1"
                      and plane_bytes <= budget)
        self.onehot = bool(onehot)
        if self.onehot:
            from .issl_mxu import _onehot_rows

            unpack = jax.jit(functools.partial(
                _onehot_rows, seq_length=index.seq_length))
            self.planes = jnp.stack([
                unpack(jnp.asarray(arrs["list_lo"][s].view(np.uint32)),
                       jnp.asarray(arrs["list_hi"][s].view(np.uint32)))
                for s in range(self.S)])
        else:
            self.planes = None
        self._runs: dict[int, callable] = {}
        # per-page compaction populations (n_single, n_mslot, n_scell,
        # n_sresc, n_mcell, n_rescan) recorded by every score_sums drain
        # — the cap-tuning instrumentation (scripts/compact_caps.py)
        self.page_stats: list[tuple[int, ...]] = []

    # -- device program ---------------------------------------------------

    def _caps(self):
        return (self.cap_single, self.cap_mslot, self.cap_scell,
                self.cap_sresc, self.cap_mcell, self.cap_rescan,
                self.cap_hits)

    def _set_caps(self, caps):
        (self.cap_single, self.cap_mslot, self.cap_scell, self.cap_sresc,
         self.cap_mcell, self.cap_rescan, self.cap_hits) = caps

    def _get_run(self, qb: int):
        key = (qb, self._caps())
        if key in self._runs:
            return self._runs[key]
        fn = jax.jit(build_run(
            S=self.S, B=self.B, nchmax=self._nchmax, chunk=self.chunk,
            qb=qb, max_dist=self.max_dist,
            rows_per_slice=self._rows_per_slice,
            caps=self._caps(), superchunk=self.superchunk,
            rescan_block=self.rescan_block, onehot=self.onehot,
            interpret=self.interpret))
        self._runs[key] = fn
        return fn

    # -- public API --------------------------------------------------------

    def _dispatch(self, lo_idx, page, pending):
        qb, _need = plan_query_occupancy(
            page, self.S, self.B, self.index.slice_width, self.qb_cap)
        if qb is None:
            half = page.shape[0] // 2
            if half == 0:
                raise RuntimeError("query bucket overflow; raise qb_cap")
            self._dispatch(lo_idx, page[:half], pending)
            self._dispatch(lo_idx + half, page[half:], pending)
            return
        lo, hi = sig_split(page)
        fn = self._get_run(qb)
        extra = (self.planes,) if self.onehot else ()
        out = fn(jnp.asarray(lo.view(np.uint32)),
                 jnp.asarray(hi.view(np.uint32)),
                 self.bucket_offsets, self.bucket_lens, self.entries,
                 *extra)
        # record the caps the program RAN with: self._caps() can grow
        # mid-drain when an earlier page overflows, and a later page
        # that ran under the old smaller caps must still be checked
        # against those (its device-side compaction truncated at them)
        pending.append((lo_idx, page, self._caps(), out))

    def _run_pages(self, pages, out_mit, out_cfd):
        pending = []
        for lo_idx, page in pages:
            self._dispatch(lo_idx, page, pending)
        # one batched drain; overflowed pages grow their caps and retry
        # (auto mode) or split in half (explicit caps)
        while pending:
            fetched = jax.device_get([o for _, _, _, o in pending])
            retry = []
            for (lo_idx, page, ran_caps, _), (header, m, c) in zip(
                    pending, fetched):
                pops = tuple(int(x) for x in header[:7])
                self.page_stats.append(pops)
                if any(p > cap for p, cap in zip(pops, ran_caps)):
                    if self._auto:
                        self._set_caps(tuple(
                            _quant_cap(p) if p > cap else cap
                            for p, cap in zip(pops, self._caps())))
                        retry.append((lo_idx, page, False))
                    else:
                        if page.shape[0] < 2:
                            raise RuntimeError(
                                "hit compaction overflow on a single "
                                "query; raise nz_cap")
                        retry.append((lo_idx, page, True))
                    continue
                ln = page.shape[0]
                out_mit[lo_idx:lo_idx + ln] = m
                out_cfd[lo_idx:lo_idx + ln] = c
            pending = []
            for lo_idx, page, split in retry:
                if split:
                    half = page.shape[0] // 2
                    self._dispatch(lo_idx, page[:half], pending)
                    self._dispatch(lo_idx + half, page[half:], pending)
                else:
                    self._dispatch(lo_idx, page, pending)

    def score_sums(self, query_sigs: np.ndarray):
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        n = sigs.shape[0]
        out_mit = np.zeros(n, dtype=np.float64)
        out_cfd = np.zeros(n, dtype=np.float64)
        pages = [(i, sigs[i:i + self.query_page])
                 for i in range(0, n, self.query_page)]
        if self._auto and not self._tuned and pages:
            # run the first page at the generous defaults, then shrink
            # every cap to ~1.25x its measured population before
            # pipelining the rest — the decode runs at cap size, so
            # right-sized caps are worth ~2x at the bench point
            self._run_pages(pages[:1], out_mit, out_cfd)
            self._set_caps(tuple(
                _quant_cap(p) for p in self.page_stats[-1]))
            self._tuned = True
            pages = pages[1:]
        self._run_pages(pages, out_mit, out_cfd)
        return out_mit, out_cfd

    def score(self, query_sigs: np.ndarray):
        mit_sum, cfd_sum = self.score_sums(query_sigs)
        return 10000.0 / (100.0 + mit_sum), 10000.0 / (100.0 + cfd_sum)


def build_run(*, S: int, B: int, nchmax: int, chunk: int, qb: int,
              max_dist: int, rows_per_slice: int,
              caps: tuple, superchunk: int = 0, rescan_block: int = 8192,
              onehot: bool = False, interpret: bool = False):
    """The compact engine's full device program for one query page:
    ``run(q_lo, q_hi, boff, blens, entries) -> (header, mit_sums,
    cfd_sums)`` — with ``onehot=True`` the signature gains a trailing
    ``planes`` argument (the (S, Epad, 128) int8 one-hot planes) and
    the finder streams those instead of unpacking the packed entries
    (:func:`_finder_kernel_onehot`; the decode still gathers the packed
    planes). Module-level so the multi-device path
    (parallel/sharded.ShardedCompactIsslScorer) can run the identical
    program per shard inside ``shard_map`` — returned UN-jitted."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cap1, capm, capsc, capsr, capm2, capr, caph = normalize_caps(caps, 0)
    pam_ngg = float(cfd_pam_penalties()[CFD_PAM_NGG_INDEX])
    nblk = -(-nchmax // 2)        # 8-row moment blocks, 2 chunks each
    nchd = 2 * nblk               # decode-side chunk-cell count
    if superchunk:
        nsc = -(-nchmax // superchunk)
        nsb = -(-nsc // 2)        # 8-row superchunk blocks
        nscd = 2 * nsb            # decode-side superchunk-cell count
    else:
        nsb = nscd = 0

    if onehot:
        kernel = functools.partial(
            _finder_kernel_onehot, chunk=chunk, qb=qb, nchmax=nchmax,
            max_dist=max_dist, superchunk=superchunk)
        finder_buf = pltpu.VMEM((2, chunk, LANES), jnp.int8)
    else:
        kernel = functools.partial(
            _finder_kernel, chunk=chunk, qb=qb, nchmax=nchmax,
            max_dist=max_dist, rows_per_slice=rows_per_slice,
            superchunk=superchunk)
        finder_buf = pltpu.VMEM((2, 3, chunk // LANES, LANES), jnp.uint32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, B, 8 * (nblk + nsb + 1), qb),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S, B),
            in_specs=[
                pl.BlockSpec((1, 1, LANES, qb),
                             lambda s, v, *_: (s, v, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, 8 * (nblk + nsb + 1), qb),
                                   lambda s, v, *_: (s, v, 0, 0)),
            scratch_shapes=[
                finder_buf,
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    # host constants (never device closures; cf. issl_dense.py notes)
    maskw_flat = np.zeros(LANES, np.float32)
    for lane in range(80):
        maskw_flat[lane] = float(1 << (lane >> 2))
    mitl_pos = np.log2(1.0 - np.asarray(MIT_WEIGHTS,
                                        np.float64)).astype(np.float32)
    pen_tab = cfd_pos_penalties().reshape(20, 16).astype(np.float32)
    even = np.uint32(0xAAAAAAAA)
    odd = np.uint32(0x55555555)

    def plan_on_device(q_lo, q_hi):
        n = q_lo.shape[0]
        vals = jnp.stack(
            [((q_lo >> (8 * s)) & jnp.uint32(0xFF)) if s < 4
             else (q_hi & jnp.uint32(0xFF))
             for s in range(S)]).astype(jnp.int32)          # (S, n)
        order = jnp.argsort(vals, axis=1, stable=True).astype(jnp.int32)
        sorted_vals = jnp.take_along_axis(vals, order, axis=1)
        s_idx = jnp.arange(S, dtype=jnp.int32)[:, None]
        counts = jnp.zeros((S, B), jnp.int32).at[s_idx, vals].add(1)
        starts = jnp.cumsum(counts, axis=1) - counts
        rank = (jnp.arange(n, dtype=jnp.int32)[None, :]
                - jnp.take_along_axis(starts, sorted_vals, axis=1))
        return jnp.full((S, B, qb), n, jnp.int32).at[
            jnp.broadcast_to(s_idx, (S, n)),
            sorted_vals, rank].set(order)

    def prelude(q_lo, q_hi, qsp):
        """Per-slot mask-weight columns. The sentinel (padding) row
        carries 2^p at EVERY (p, base) lane, so padded slots read the
        all-mismatch mask (dist 20) and never flag as hits."""
        n = q_lo.shape[0]
        p = jnp.arange(20, dtype=jnp.uint32)
        sh = (2 * p) % 32
        word = jnp.where(p >= 16, q_hi[:, None], q_lo[:, None])
        codes = ((word >> sh) & 3).astype(jnp.int32)      # (n, 20)
        pw = jnp.asarray(
            np.exp2(np.arange(20)).astype(np.float32))    # (20,)
        onehot = jax.nn.one_hot(codes, 4, dtype=jnp.float32)  # (n,20,4)
        w = ((1.0 - onehot) * pw[None, :, None]).reshape(n, 80)
        full = jnp.zeros((n + 1, LANES), jnp.float32)
        full = full.at[:n, :80].set(w)
        full = full.at[n, :].set(jnp.asarray(maskw_flat))
        g = full.astype(jnp.bfloat16)[qsp]            # (S, B, qb, 128)
        return jnp.transpose(g, (0, 1, 3, 2))

    def collapse_mask(x_lo, x_hi):
        """XOR pair -> 20-bit mismatch-position mask."""
        c_lo = ((x_lo & even) >> 1) | (x_lo & odd)
        c_hi = ((x_hi & even) >> 1) | (x_hi & odd)
        mask = jnp.zeros_like(c_lo)
        for p_ in range(16):
            mask |= ((c_lo >> (2 * p_)) & 1) << p_
        for p_ in range(4):
            mask |= ((c_hi >> (2 * p_)) & 1) << (16 + p_)
        return mask

    def pair_scores(q_lo_v, q_hi_v, e_lo, e_hi, occ, valid):
        """Elementwise per-(query, entry) MIT/CFD contributions
        (already x occurrences, zeroed where invalid); f32.
        Broadcasts over any common shape."""
        mask = collapse_mask(e_lo ^ q_lo_v, e_hi ^ q_hi_v)
        mi = mask.astype(jnp.int32)
        dist = jax.lax.population_count(mi)
        mi1 = jnp.maximum(mi, 1)
        first = jax.lax.population_count(~mi1 & (mi1 - 1))
        last = 31 - jax.lax.clz(mi1)
        m = dist.astype(jnp.float32)
        md = jnp.maximum(m - 1.0, 1.0)
        u = jnp.where(dist == 1, jnp.float32(19.0),
                      (last - first).astype(jnp.float32))
        mit_log = jnp.zeros_like(m)
        for p_ in range(20):
            mit_log += jnp.where((mi >> p_) & 1, mitl_pos[p_], 0.0)
        t1 = jnp.exp2(mit_log)
        den = (95.0 * md - 4.0 * u) * jnp.maximum(m * m, 1.0)
        mit_local = jnp.where(dist > 0, t1 * (1900.0 * md) / den, 0.0)
        cfd = jnp.full_like(m, pam_ngg)
        for p_ in range(20):
            qb2 = ((jnp.where(p_ >= 16, q_hi_v, q_lo_v)
                    >> ((2 * p_) % 32)) & 3).astype(jnp.int32)
            ob2 = ((jnp.where(p_ >= 16, e_hi, e_lo)
                    >> ((2 * p_) % 32)) & 3).astype(jnp.int32)
            pen = jnp.asarray(pen_tab[p_])[(qb2 << 2) | (ob2 ^ 3)]
            cfd = cfd * jnp.where(qb2 != ob2, pen, 1.0)
        cfd_local = jnp.where(dist == 0, 1.0, cfd)
        vf = jnp.where(valid, occ.astype(jnp.float32), 0.0)
        return mit_local * vf, cfd_local * vf

    def gather_entries(entries, flatpos, sl):
        row = sl * rows_per_slice + flatpos // LANES
        lane = flatpos % LANES
        return (entries[0][row, lane], entries[1][row, lane],
                entries[2][row, lane])

    def decode_score(q_lo, q_hi, qsp_flat, kout, boff, blens, entries):
        n = q_lo.shape[0]
        # packed layout: block b rows [4k, 4k+3] = (cnt, rank-sum, min
        # rank, max rank) of chunk 2b + k; blocks [nblk, nblk+nsb) =
        # superchunk moments (when the tree level is on); block nblk+nsb
        # rows 0-3 = bucket totals. Cells past the bucket's last chunk
        # are all-zero and never flagged downstream. Slot totals come
        # straight from the kernel's bucket-total rows — the full
        # chunk-moment planes are only ever point-gathered, never
        # reduced or transposed whole, so decode prep stays O(page)
        # however deep the buckets are. The min/max pair resolves any
        # 1-2 hit population pointwise at EVERY tree level (two distinct
        # hits have distinct ranks), so only >=3-hit cells descend and
        # only >=3-hit chunks are rescanned.
        base = 8 * (nblk + nsb)
        slot_cnt = kout[:, :, base, :].reshape(-1)
        slot_min = kout[:, :, base + 2, :].reshape(-1)
        slot_max = kout[:, :, base + 3, :].reshape(-1)

        def unravel_slot(i):
            sl = i // (B * qb)
            r = i % (B * qb)
            return sl, r // qb, r % qb

        def q_of(slot_idx):
            return jnp.minimum(qsp_flat[slot_idx], n)

        mit_sums = jnp.zeros(n + 1, jnp.float32)
        cfd_sums = jnp.zeros(n + 1, jnp.float32)

        def score_direct(sS, sB, hq, cnt, rmin, rmax, valid):
            """Score a compacted batch of 1-2 hit cells pointwise: the
            min rank is the (only/first) hit, the max rank the second
            when cnt == 2. Returns per-cell (mit, cfd) contributions."""
            qi = jnp.minimum(hq, n - 1)
            va = valid & (cnt >= 1.0) & (cnt <= 2.0) & (hq < n)
            vb = valid & (cnt == 2.0) & (hq < n)
            ka = jnp.where(va, rmin, 0.0).astype(jnp.int32)
            kb = jnp.where(vb, rmax, 0.0).astype(jnp.int32)
            lo_a, hi_a, occ_a = gather_entries(entries,
                                               boff[sS, sB] + ka, sS)
            m_a, c_a = pair_scores(q_lo[qi], q_hi[qi], lo_a, hi_a,
                                   occ_a, va)
            lo_b, hi_b, occ_b = gather_entries(entries,
                                               boff[sS, sB] + kb, sS)
            m_b, c_b = pair_scores(q_lo[qi], q_hi[qi], lo_b, hi_b,
                                   occ_b, vb)
            return m_a + m_b, c_a + c_b

        # 1) direct slots (1-2 hits): min/max ranks come straight from
        # the bucket totals — no tree walk, no rescan
        direct = (slot_cnt == 1.0) | (slot_cnt == 2.0)
        n1 = jnp.sum(direct.astype(jnp.int32))
        sidx = _compact_indices(direct, cap1)
        v1 = sidx >= 0
        si = jnp.maximum(sidx, 0)
        s1, b1, _ = unravel_slot(si)
        hq1 = q_of(si)
        m1_, c1_ = score_direct(s1, b1, hq1,
                                jnp.where(v1, slot_cnt[si], 0.0),
                                slot_min[si], slot_max[si], v1)
        mit_sums = mit_sums.at[hq1].add(m1_)
        cfd_sums = cfd_sums.at[hq1].add(c1_)
        if _STAGES < 2:
            header = jnp.stack([n1] + [jnp.int32(0)] * 7)
            return header, mit_sums[:n], cfd_sums[:n]

        # 2) >=3-hit slots expand down the moment tree. With the
        # superchunk level on, each flagged slot point-gathers only its
        # (nscd,) superchunk cell counts; 1-2 hit superchunk cells
        # resolve directly from their min/max, and only >=3-hit
        # superchunk cells expand into their (superchunk,) chunk cells —
        # O(sqrt(depth)) cells per slot. Without the level, slots gather
        # their (nchd,) chunk cell counts directly. Either way the
        # planes are never reduced or transposed whole, and min/max are
        # gathered pointwise for compacted nonzero cells only.
        multi = slot_cnt >= 3.0
        nm = jnp.sum(multi.astype(jnp.int32))
        midx = _compact_indices(multi, capm)
        vm = (midx >= 0)[:, None]
        s2_, b2_, q2_ = unravel_slot(jnp.maximum(midx, 0))
        n_sc = n_sr = jnp.int32(0)
        if superchunk:
            scj = jnp.arange(nscd, dtype=jnp.int32)
            rowsc = 8 * (nblk + scj // 2) + 4 * (scj % 2)
            msc = jnp.where(vm, kout[s2_[:, None], b2_[:, None],
                                     rowsc[None, :], q2_[:, None]], 0.0)
            n_sc = jnp.sum((msc > 0).astype(jnp.int32))
            scz = _compact_indices(msc.reshape(-1) > 0, capsc)
            vsz = scz >= 0
            szi = jnp.maximum(scz, 0)
            srow = szi // nscd
            s_sc = szi % nscd
            sslot = jnp.maximum(midx[srow], 0)
            scnt = msc.reshape(-1)[szi]
            sS, sB, sQ = unravel_slot(sslot)
            rowS = 8 * (nblk + s_sc // 2) + 4 * (s_sc % 2)
            smin = kout[sS, sB, rowS + 2, sQ]
            smax = kout[sS, sB, rowS + 3, sQ]
            hqS = q_of(sslot)
            mS_, cS_ = score_direct(sS, sB, hqS,
                                    jnp.where(vsz, scnt, 0.0),
                                    smin, smax, vsz)
            mit_sums = mit_sums.at[hqS].add(mS_)
            cfd_sums = cfd_sums.at[hqS].add(cS_)
            # >=3-hit superchunk cells -> their chunk cells
            c2sc = vsz & (scnt >= 3.0)
            n_sr = jnp.sum(c2sc.astype(jnp.int32))
            sridx = _compact_indices(c2sc, capsr)
            vsr = (sridx >= 0)[:, None]
            sri = jnp.maximum(sridx, 0)
            src_slot = sslot[sri]
            sS2, sB2, sQ2 = sS[sri], sB[sri], sQ[sri]
            ch = (s_sc[sri][:, None] * superchunk
                  + jnp.arange(superchunk, dtype=jnp.int32)[None, :])
            ch_ok = ch < nchd      # the last superchunk may overhang
            chc = jnp.minimum(ch, nchd - 1)
            rowc2 = 8 * (chc // 2) + 4 * (chc % 2)
            mc = jnp.where(vsr & ch_ok,
                           kout[sS2[:, None], sB2[:, None], rowc2,
                                sQ2[:, None]], 0.0)
            width = superchunk
            chfun = lambda mzc: ch.reshape(-1)[mzc]
        else:
            chj = jnp.arange(nchd, dtype=jnp.int32)
            rowc = 8 * (chj // 2) + 4 * (chj % 2)   # cnt row of chunk j
            mc = jnp.where(vm, kout[s2_[:, None], b2_[:, None],
                                    rowc[None, :], q2_[:, None]], 0.0)
            src_slot = jnp.maximum(midx, 0)
            width = nchd
            chfun = lambda mzc: mzc % nchd
        nc = jnp.sum((mc > 0).astype(jnp.int32))
        mz = _compact_indices(mc.reshape(-1) > 0, capm2)
        vz = mz >= 0
        mzc = jnp.maximum(mz, 0)
        mrow = mzc // width
        mchk = chfun(mzc)
        mslot = src_slot[mrow]
        mcnt = mc.reshape(-1)[mzc]
        sM, bM, qM = unravel_slot(mslot)
        mchk_c = jnp.minimum(mchk, nchd - 1)
        rowM = 8 * (mchk_c // 2) + 4 * (mchk_c % 2)
        mmin = kout[sM, bM, rowM + 2, qM]
        mmax = kout[sM, bM, rowM + 3, qM]
        hqM = q_of(mslot)
        mM_, cM_ = score_direct(sM, bM, hqM,
                                jnp.where(vz, mcnt, 0.0),
                                mmin, mmax, vz)
        mit_sums = mit_sums.at[hqM].add(mM_)
        cfd_sums = cfd_sums.at[hqM].add(cM_)
        if _STAGES < 3:
            header = jnp.stack([n1, nm, n_sc, n_sr, nc] + [jnp.int32(0)] * 3)
            return header, mit_sums[:n], cfd_sums[:n]

        # 3) >=3-hit chunks: rescan-and-score all <=chunk entries
        # INLINE (elementwise + row sum; no hit extraction — compacting
        # the sparse hits first costs a pairs-sized flat cumsum that
        # measures 3x slower than scoring everything in one fused pass,
        # scripts/profile_compact_results.jsonl). All per-pair
        # arithmetic works on the collapsed XOR words directly — no
        # 20-bit mask packing — and CFD selects from a per-ROW penalty
        # table (the query is fixed per row), so the only pair-level
        # table op is a 4-way select.
        c2 = vz & (mcnt >= 3.0)
        n2c = jnp.sum(c2.astype(jnp.int32))
        ridx = _compact_indices(c2, capr)
        # blocked rescan: lax.map over row-blocks of <=rescan_block
        # chunks keeps the gathered temporaries O(rblk x chunk) however
        # large capr is (an unblocked capr=87K gather OOMed a 16 GB chip
        # at mouse depth); one block = one fully fused pass
        rblk = min(capr, rescan_block)
        nrb = -(-capr // rblk)
        pad = nrb * rblk - capr
        ridx_b = jnp.concatenate(
            [ridx, jnp.full((pad,), -1, jnp.int32)]).reshape(nrb, rblk)
        p20 = jnp.arange(20, dtype=jnp.uint32)
        shq = (2 * p20) % 32
        b4 = jnp.arange(4, dtype=jnp.int32)[None, None, :]
        pen_dev = jnp.asarray(pen_tab)
        p20i = jnp.arange(20, dtype=jnp.int32)[None, :, None]

        def scan_block(rbx):
            vr = rbx >= 0
            ri = jnp.maximum(rbx, 0)
            rs, rb = sM[ri], bM[ri]
            rq = jnp.minimum(q_of(mslot[ri]), n - 1)
            rq_valid = vr & (q_of(mslot[ri]) < n)
            start = boff[rs, rb] + mchk[ri] * chunk   # chunk | ALIGN
            rows0 = rs * rows_per_slice + start // LANES
            rr = rows0[:, None] + jnp.arange(chunk // LANES,
                                             dtype=jnp.int32)[None, :]
            e_lo = entries[0][rr].reshape(-1, chunk)   # (rblk, chunk)
            e_hi = entries[1][rr].reshape(-1, chunk)
            e_occ = entries[2][rr].reshape(-1, chunk)
            cols = jnp.arange(chunk, dtype=jnp.int32)[None, :]
            x_lo = e_lo ^ q_lo[rq][:, None]
            x_hi = e_hi ^ q_hi[rq][:, None]
            c_lo = ((x_lo & even) >> 1) | (x_lo & odd)  # bit 2p = mm p
            c_hi = ((x_hi & even) >> 1) | (x_hi & odd)
            distR = (jax.lax.population_count(c_lo)
                     + jax.lax.population_count(c_hi)).astype(jnp.int32)
            # first-clean-slice dedup on bytes: slice s' < rs is clean
            # iff byte s' of c_lo is zero (slice 4 is never "earlier")
            bsel = jnp.where(
                rs[:, None] >= 4, jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << (8 * jnp.minimum(rs[:, None], 3)))
                - jnp.uint32(1))
            xb = c_lo | ~bsel
            seenR = ((xb - jnp.uint32(0x01010101)) & ~xb
                     & jnp.uint32(0x80808080)) != 0
            in_chunk = cols < (blens[rs, rb] - mchk[ri] * chunk)[:, None]
            rvalid = ((distR <= max_dist) & ~seenR & in_chunk
                      & rq_valid[:, None])
            # MIT closed form from the collapsed words
            lo_i = c_lo.astype(jnp.int32)
            hi_i = c_hi.astype(jnp.int32)
            ctz_lo = jax.lax.population_count(~lo_i & (lo_i - 1))
            ctz_hi = jax.lax.population_count(~hi_i & (hi_i - 1))
            firstR = jnp.where(lo_i != 0, ctz_lo >> 1, 16 + (ctz_hi >> 1))
            lastR = jnp.where(
                hi_i != 0,
                16 + ((31 - jax.lax.clz(jnp.maximum(hi_i, 1))) >> 1),
                (31 - jax.lax.clz(jnp.maximum(lo_i, 1))) >> 1)
            mR = distR.astype(jnp.float32)
            mdR = jnp.maximum(mR - 1.0, 1.0)
            uR = jnp.where(distR == 1, jnp.float32(19.0),
                           (lastR - firstR).astype(jnp.float32))
            mit_logR = jnp.zeros_like(mR)
            for p_ in range(16):
                mit_logR += jnp.where((c_lo >> (2 * p_)) & 1,
                                      mitl_pos[p_], 0.0)
            for p_ in range(4):
                mit_logR += jnp.where((c_hi >> (2 * p_)) & 1,
                                      mitl_pos[16 + p_], 0.0)
            denR = (95.0 * mdR - 4.0 * uR) * jnp.maximum(mR * mR, 1.0)
            mitR = jnp.where(distR > 0,
                             jnp.exp2(mit_logR) * (1900.0 * mdR) / denR,
                             0.0)
            # CFD: per-row (20, 4) penalty table with 1.0 baked at the
            # matching base, then a 4-way select per (pair, position)
            qword = jnp.where(p20[None, :] >= 16, q_hi[rq][:, None],
                              q_lo[rq][:, None])
            rcodes = ((qword >> shq[None, :]) & 3).astype(jnp.int32)
            pidx = (rcodes[:, :, None] << 2) | (b4 ^ 3)
            rpen = pen_dev[p20i, pidx]
            rpen = jnp.where(b4 == rcodes[:, :, None], 1.0, rpen)
            cfdR = jnp.full_like(mR, pam_ngg)
            for p_ in range(20):
                eword = e_hi if p_ >= 16 else e_lo
                ob = ((eword >> ((2 * p_) % 32)) & 3).astype(jnp.int32)
                t0 = rpen[:, p_, 0][:, None]
                t1 = rpen[:, p_, 1][:, None]
                t2 = rpen[:, p_, 2][:, None]
                t3 = rpen[:, p_, 3][:, None]
                pen = jnp.where(ob < 2, jnp.where(ob == 0, t0, t1),
                                jnp.where(ob == 2, t2, t3))
                cfdR = cfdR * pen
            cfdR = jnp.where(distR == 0, 1.0, cfdR)
            vfR = jnp.where(rvalid, e_occ.astype(jnp.float32), 0.0)
            hqR = jnp.where(rq_valid, q_of(mslot[ri]), n)
            return hqR, jnp.sum(mitR * vfR, axis=1), \
                jnp.sum(cfdR * vfR, axis=1)

        if nrb == 1:
            hqB, mB, cB = scan_block(ridx_b[0])
        else:
            hqB, mB, cB = jax.lax.map(scan_block, ridx_b)
        mit_sums = mit_sums.at[hqB.reshape(-1)].add(mB.reshape(-1))
        cfd_sums = cfd_sums.at[hqB.reshape(-1)].add(cB.reshape(-1))

        header = jnp.stack([n1, nm, n_sc, n_sr, nc, n2c,
                            jnp.int32(0), jnp.int32(0)])
        return header, mit_sums[:n], cfd_sums[:n]

    if onehot:
        def run(q_lo, q_hi, boff, blens, entries, planes):
            qsp = plan_on_device(q_lo, q_hi)
            wts = prelude(q_lo, q_hi, qsp)
            kout = call(boff, blens, wts, planes)
            return decode_score(q_lo, q_hi, qsp.reshape(-1), kout,
                                boff, blens, entries)
    else:
        def run(q_lo, q_hi, boff, blens, entries):
            qsp = plan_on_device(q_lo, q_hi)
            wts = prelude(q_lo, q_hi, qsp)
            kout = call(boff, blens, wts, entries)
            return decode_score(q_lo, q_hi, qsp.reshape(-1), kout,
                                boff, blens, entries)

    return run
