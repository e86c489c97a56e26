"""Bucket-major Pallas TPU kernel for ISSL off-target scoring.

The XLA engine (ops/issl_jax.py) is gather-bound: every work item random-
gathers its entry and its query. This kernel restructures the scan to be
**bucket-major**: the grid is (slice, bucket-value); each program streams
its bucket's entries HBM->VMEM once (double-buffered superchunks of
``(rows, 128)`` int32 tiles — the native VPU layout) and scores them
against *all queries whose slice value maps to that bucket*. Per-page DMA
volume is therefore ``slice_count x index_size`` — independent of the query
count — and the inner loop is pure VPU arithmetic:

* Hamming distance via XOR + 2-bit collapse + popcount
  (reference isslScoreOfftargets.cpp:376-380);
* the per-query seen-set as the stateless first-clean-slice rule
  (equivalent to isslScoreOfftargets.cpp:385-387,463 under full scan);
* closed-form MIT local score (isslCreateIndex.cpp:93-118);
* CFD penalty product via select trees over the 320 published constants
  (isslScoreOfftargets.cpp:399-461) — no table gathers anywhere;
* superchunks whose tile has no in-range hit for the current query skip
  the scoring phase entirely (the overwhelmingly common case), so the
  effective per-entry cost is the ~15-op distance filter.

Mosaic has no dynamic-lane vector indexing, so all per-query bookkeeping is
scalar: sorted query ids and query signature words arrive via scalar
prefetch (SMEM), queries are splat-broadcast one at a time against entry
tiles, and per-query partial sums accumulate into SMEM outputs (scalar
read-modify-write), folded back to per-query totals by a tiny XLA epilogue.

Early-exit thresholds are not applied (bucket-major order differs from the
reference scan order); scoring is always full-scan, which preserves
verdicts for the mit/cfd/and/or methods and all accepted-guide scores (see
ops/issl_jax.py for the ``avg`` caveat and the order-exact engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import sig_split
from ..index.build import IsslIndex
from ..utils.jaxcache import enable_persistent_cache
from .tables import (CFD_PAM_NGG_INDEX, MIT_WEIGHTS, cfd_pam_penalties,
                     cfd_pos_penalties)

enable_persistent_cache()

LANES = 128
ALIGN = 1024          # bucket start alignment, entries


def _select4(code, c0, c1, c2, c3):
    """4-way select of (broadcastable) values by 2-bit ``code``."""
    lo = jnp.where((code & 1) != 0, c1, c0)
    hi = jnp.where((code & 1) != 0, c3, c2)
    return jnp.where((code & 2) != 0, hi, lo)


def _kernel(qoff_ref, boff_ref, blen_ref, qsorted_ref, q_lo_ref, q_hi_ref,
            list_lo_hbm, list_hi_hbm, list_occ_hbm,   # HBM (rows, 128)
            mit_ref, cfd_ref,                         # SMEM outs (S*Q,)
            buf_lo, buf_hi, buf_occ, sems,            # scratch
            *, sup: int, slice_count: int, slice_width: int,
            max_dist: int, pam_ngg: float, rows_total: int, q_page: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = pl.program_id(0)
    v = pl.program_id(1)
    sup_rows = sup // LANES

    q_start = qoff_ref[s, v]
    nq = qoff_ref[s, v + 1] - q_start
    b_start = boff_ref[s, v]          # ALIGN-aligned entry offset
    blen = blen_ref[s, v]
    row_base = s * rows_total + b_start // LANES

    nsup = pl.cdiv(blen, jnp.int32(sup))  # int32 under x64 too

    # zero this program's output slots; every (slice, query) slot is owned
    # by exactly one (slice, bucket) program, so this is complete and
    # race-free even for queries whose bucket is empty
    def zero_body(qi, _):
        out_slot = s * q_page + q_start + qi
        mit_ref[out_slot] = 0.0
        cfd_ref[out_slot] = 0.0
        return 0

    jax.lax.fori_loop(0, nq, zero_body, 0)

    pos_pen = cfd_pos_penalties().astype(np.float32)

    def dma(slot, c):
        row0 = pl.multiple_of(row_base + c * sup_rows, ALIGN // LANES)
        return [
            pltpu.make_async_copy(
                hbm.at[pl.ds(row0, sup_rows), :], buf.at[slot], sems.at[slot])
            for hbm, buf in ((list_lo_hbm, buf_lo), (list_hi_hbm, buf_hi),
                             (list_occ_hbm, buf_occ))
        ]

    @pl.when((nq > 0) & (blen > 0))
    def _process():
        for d in dma(0, 0):
            d.start()

        def sup_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < nsup)
            def _():
                for d in dma((c + 1) % 2, c + 1):
                    d.start()

            for d in dma(slot, c):
                d.wait()

            o_lo = buf_lo[slot]                       # (sup_rows, 128) u32
            o_hi = buf_hi[slot]
            occ_f = buf_occ[slot].astype(jnp.float32)
            entry_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (sup_rows, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (sup_rows, LANES), 1)
                + c * sup
            )
            in_bucket = entry_ids < blen

            def one_query(qi):
                qid = qsorted_ref[s, q_start + qi]
                ql_s = q_lo_ref[qid].astype(jnp.uint32)
                qh_s = q_hi_ref[qid].astype(jnp.uint32)

                # scalar-broadcast ops: the query signature never becomes a
                # tile, halving the distance-phase VPU work
                x_lo = o_lo ^ ql_s
                x_hi = o_hi ^ qh_s
                coll_lo = ((x_lo & jnp.uint32(0xAAAAAAAA)) >> 1) | \
                    (x_lo & jnp.uint32(0x55555555))
                coll_hi = ((x_hi & jnp.uint32(0xAAAAAAAA)) >> 1) | \
                    (x_hi & jnp.uint32(0x55555555))
                dist = (jax.lax.population_count(coll_lo)
                        + jax.lax.population_count(coll_hi)).astype(jnp.int32)
                hit = (dist <= max_dist) & in_bucket

                # first-clean-slice dedup IN THE SCAN PHASE: a hit counts in
                # this program's slice only if no earlier slice matches
                # exactly. Hits within max_dist match in several slices
                # (always all 5 for self-hits), so gating the expensive
                # phase on ``valid`` rather than ``hit`` skips the
                # duplicate scoring passes entirely.
                smask = jnp.uint32((1 << slice_width) - 1)
                seen_earlier = jnp.zeros(hit.shape, dtype=jnp.bool_)
                for sp in range(slice_count):
                    shift = sp * slice_width
                    word = x_lo if shift < 32 else x_hi
                    sh = shift if shift < 32 else shift - 32
                    clean_sp = ((word >> jnp.uint32(sh)) & smask) == 0
                    seen_earlier = seen_earlier | (clean_sp & (sp < s))
                valid = hit & ~seen_earlier

                # NOTE(perf): the vector->scalar any() + branch costs ~1us
                # (cross-unit sync) but skipping the ~2.7us scoring phase
                # wins decisively (unconditional scoring measured 1.7x
                # slower end-to-end).
                @pl.when(jnp.any(valid))
                def _score():

                    # per-position walk drives MIT T1 and the CFD selects
                    t1 = jnp.ones(hit.shape, dtype=jnp.float32)
                    cfdp = jnp.full(hit.shape, pam_ngg, dtype=jnp.float32)
                    mm20 = jnp.zeros(hit.shape, dtype=jnp.int32)
                    for p in range(20):
                        # query base is a SCALAR: the four candidate CFD
                        # penalties for this position collapse to scalar
                        # selects; only the off-target base is a tile
                        if p < 16:
                            qb_s = (ql_s >> jnp.uint32(2 * p)) & jnp.uint32(3)
                            ob = (o_lo >> jnp.uint32(2 * p)) & jnp.uint32(3)
                        else:
                            qb_s = (qh_s >> jnp.uint32(2 * (p - 16))) & jnp.uint32(3)
                            ob = (o_hi >> jnp.uint32(2 * (p - 16))) & jnp.uint32(3)
                        mm = ob != qb_s
                        mm20 = mm20 | (mm.astype(jnp.int32) << p)
                        t1 = t1 * jnp.where(
                            mm, jnp.float32(1.0 - MIT_WEIGHTS[p]),
                            jnp.float32(1.0))
                        # pen = pos_pen[p, qb*4 + (ob^3)] via a select tree
                        # over the complemented off-target base
                        cob = ob ^ jnp.uint32(3)
                        row = pos_pen[p]
                        tsel = [
                            _select4(qb_s, row[0 + t], row[4 + t],
                                     row[8 + t], row[12 + t])
                            for t in range(4)
                        ]
                        pen = _select4(cob, tsel[0], tsel[1], tsel[2], tsel[3])
                        cfdp = cfdp * jnp.where(mm, pen, jnp.float32(1.0))

                    # first/last mismatch positions via ctz/clz on the
                    # 20-bit mask (branch-free; replaces 40 tile selects)
                    nz = jnp.maximum(mm20, 1)
                    first = jax.lax.population_count((nz & -nz) - 1)
                    last = 31 - jax.lax.clz(nz)
                    m = dist.astype(jnp.float32)
                    d = jnp.where(
                        dist == 1, jnp.float32(19.0),
                        (last - first).astype(jnp.float32)
                        / jnp.maximum(m - 1.0, 1.0))
                    t2 = 1.0 / ((19.0 - d) / 19.0 * 4.0 + 1.0)
                    t3 = 1.0 / jnp.maximum(m * m, 1.0)
                    mit_local = jnp.where(dist > 0, t1 * t2 * t3 * 100.0, 0.0)
                    cfd_local = jnp.where(dist == 0, jnp.float32(1.0), cfdp)

                    vf = jnp.where(valid, occ_f, 0.0)
                    out_slot = s * q_page + q_start + qi
                    mit_ref[out_slot] = mit_ref[out_slot] + jnp.sum(mit_local * vf)
                    cfd_ref[out_slot] = cfd_ref[out_slot] + jnp.sum(cfd_local * vf)

            # manual 4x unroll: the per-iteration scalar bookkeeping (loop
            # control, SMEM reads, branch setup) dominates small buckets
            def query_body4(qi4, _):
                for k in range(4):
                    qi = qi4 * 4 + k

                    @pl.when(qi < nq)
                    def _(qi=qi):
                        one_query(qi)

                return 0

            jax.lax.fori_loop(0, (nq + 3) // 4, query_body4, 0)
            return 0

        jax.lax.fori_loop(0, nsup, sup_body, 0)


class PallasIsslScorer:
    """Single-chip bucket-major Pallas scorer."""

    def __init__(self, index: IsslIndex, max_dist: int | None = None,
                 query_page: int = 8192, superchunk: int = 16384,
                 interpret: bool = False):
        # defaults tuned on v5e (5M-site index): Q=8192/sup=16K reached
        # ~69K guides/s (~12x the 4-core reference binary); Q=16384
        # overflows SMEM (sorted-slot + output slot arrays).
        if index.slice_width > 16 or index.slice_width % 2:
            raise ValueError("unsupported slice width")
        if superchunk % ALIGN:
            raise ValueError(f"superchunk must be a multiple of {ALIGN}")
        self.index = index
        self.max_dist = index.max_dist if max_dist is None else int(max_dist)
        self.query_page = int(query_page)
        self.sup = int(superchunk)
        self.interpret = interpret
        self.S = index.slice_count
        self.B = index.bucket_count

        # bucket-aligned layout: every bucket at an ALIGN boundary plus a
        # superchunk-sized dead tail so chunk DMAs never run off the end
        arrs = index.device_arrays_aligned(align=ALIGN, tail=self.sup)
        npad = arrs["list_lo"].shape[1]
        self._rows_total = npad // LANES
        as_rows = lambda a: a.reshape(-1, LANES)
        self.list_lo = jax.device_put(as_rows(arrs["list_lo"].reshape(-1).view(np.uint32)))
        self.list_hi = jax.device_put(as_rows(arrs["list_hi"].reshape(-1).view(np.uint32)))
        self.list_occ = jax.device_put(as_rows(arrs["list_occ"].reshape(-1)))
        self.bucket_offsets = jax.device_put(arrs["bucket_offsets"])
        self.bucket_lens = jax.device_put(arrs["bucket_lens"])
        self._run = jax.jit(self._run_impl)

    # -- device-side page planning -------------------------------------

    def _plan(self, q_lo, q_hi):
        """Sort queries by bucket per slice.

        Returns qoff (S, B+1) int32 and qsorted (S, Q) int32."""
        Q = self.query_page
        w = self.index.slice_width
        bmask = np.uint32(self.B - 1)
        qoffs, qsorted = [], []
        for s in range(self.S):
            shift = s * w
            word = q_lo if shift < 32 else q_hi
            sh = shift if shift < 32 else shift - 32
            vals = ((word[:Q] >> jnp.uint32(sh)) & bmask).astype(jnp.int32)
            order = jnp.argsort(vals, stable=True).astype(jnp.int32)
            counts = jnp.zeros(self.B, jnp.int32).at[vals].add(1)
            offs = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
            qoffs.append(offs)
            qsorted.append(order)
        return jnp.stack(qoffs), jnp.stack(qsorted)

    def _pallas_call(self):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, B, Q = self.S, self.B, self.query_page
        sup_rows = self.sup // LANES
        kernel = functools.partial(
            _kernel,
            sup=self.sup,
            slice_count=S,
            slice_width=self.index.slice_width,
            max_dist=self.max_dist,
            pam_ngg=float(cfd_pam_penalties()[CFD_PAM_NGG_INDEX]),
            rows_total=self._rows_total,
            q_page=Q,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,  # qoff, boff, blens, qsorted, q_lo, q_hi
            grid=(S, B),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),    # list_lo rows
                pl.BlockSpec(memory_space=pltpu.HBM),    # list_hi rows
                pl.BlockSpec(memory_space=pltpu.HBM),    # list_occ rows
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # mit slot sums
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cfd slot sums
            ],
            scratch_shapes=[
                pltpu.VMEM((2, sup_rows, LANES), jnp.uint32),
                pltpu.VMEM((2, sup_rows, LANES), jnp.uint32),
                pltpu.VMEM((2, sup_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((S * Q,), jnp.float32),
                jax.ShapeDtypeStruct((S * Q,), jnp.float32),
            ],
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=self.interpret,
        )

    def _run_impl(self, q_lo, q_hi, list_lo, list_hi, list_occ, boff, blens):
        Q = self.query_page
        qoff, qsorted = self._plan(q_lo, q_hi)
        mit_slots, cfd_slots = self._pallas_call()(
            qoff, boff, blens, qsorted, q_lo.astype(jnp.int32),
            q_hi.astype(jnp.int32), list_lo, list_hi, list_occ,
        )
        flat_ids = qsorted.reshape(-1)
        mit = jnp.zeros(Q, jnp.float32).at[flat_ids].add(mit_slots)
        cfd = jnp.zeros(Q, jnp.float32).at[flat_ids].add(cfd_slots)
        return mit, cfd

    # -- public API ------------------------------------------------------

    def score_sums(self, query_sigs: np.ndarray):
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        n = sigs.shape[0]
        Q = self.query_page
        mit = np.zeros(n, dtype=np.float64)
        cfd = np.zeros(n, dtype=np.float64)
        for i in range(0, n, Q):
            page = sigs[i:i + Q]
            pad = Q - page.shape[0]
            if pad:
                page = np.concatenate([page, np.zeros(pad, dtype=np.uint64)])
            lo, hi = sig_split(page)
            q_lo = lo.view(np.uint32).copy()
            q_hi = hi.view(np.uint32).copy()
            if pad:
                # padded queries: garbage high bits -> never within range
                q_hi[Q - pad:] = np.uint32(0xFFFFFFFF)
            m, c = self._run(
                jnp.asarray(q_lo), jnp.asarray(q_hi),
                self.list_lo, self.list_hi, self.list_occ,
                self.bucket_offsets, self.bucket_lens,
            )
            take = Q - pad
            mit[i:i + take] = np.asarray(m, dtype=np.float64)[:take]
            cfd[i:i + take] = np.asarray(c, dtype=np.float64)[:take]
        return mit, cfd

    def score(self, query_sigs: np.ndarray):
        mit_sum, cfd_sum = self.score_sums(query_sigs)
        return 10000.0 / (100.0 + mit_sum), 10000.0 / (100.0 + cfd_sum)
