"""MXU (matmul) ISSL off-target engine — bit-exact at matmul speed.

The round-1 Pallas engine (ops/issl_pallas.py) streams each bucket once and
scores queries one at a time with scalar-broadcast VPU arithmetic; its
throughput ceiling is the ~2 us of per-(query, superchunk) scalar bookkeeping
that Mosaic's no-dynamic-lane-indexing rule forces. This engine removes the
per-query scalar work entirely by reformulating the Hamming filter as a
**systolic-array matmul**:

* every distinct site is stored as a one-hot **bit-plane row** — 80 int8
  lanes, one per (position, base) pair, padded to 128 — in each slice's
  bucket-sorted order (layout ``(S, Epad, 128)``, entries along sublanes so
  chunk DMAs are fully contiguous);
* each query becomes the same 80-dim one-hot vector, so
  ``matches[e, q] = dot(entry_planes, query_planes)`` is the **exact** count
  of matching bases — base-level Hamming distance from a single bf16 matmul
  (f32 accumulate; values <= 20, so the arithmetic is exact);
* the kernel's only output is a per-(slice, bucket, query-slot) count of
  *neighbours* (sites at distance 1..max_dist). No scoring, no seen-set,
  no per-query branches — one matmul + compare + lane-major row-sum per
  entry chunk.

Scoring is then exact by construction:

* queries with **zero** neighbours (the overwhelmingly common case on real
  inputs) have a closed-form reference result: the only possible hit is the
  query's own site (distance 0 contributes MIT 0 and CFD ``1.0 * occ``,
  isslScoreOfftargets.cpp:393,407-408), found by binary search over the
  lexicographically sorted site list;
* flagged queries are replayed by the host oracle
  (ops/oracle.py:score_exact) — f64 accumulation in exact reference scan
  order, per-query seen-set, and the score-visible early exit — so MIT/CFD
  outputs are bit-identical to ``isslScoreOfftargets`` for **all five
  methods including ``avg``** (the method full-scan engines cannot
  reproduce, cf. isslScoreOfftargets.cpp:479-484).

Discovery parity: the reference only ever *finds* an off-target through a
slice whose bits match exactly (isslScoreOfftargets.cpp:330-344); a site
within max_dist <= sliceCount-1 mismatches always has such a slice
(pigeonhole, isslCreateIndex.cpp:241). The kernel's bucket grid scans the
identical (slice value == query slice value) lists, so its neighbour flags
cover exactly the reference's reachable hit set.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import sig_split
from ..index.build import IsslIndex

LANES = 128
ALIGN = 1024      # bucket start alignment, entries (rows of the plane array)

# the engine's compiled programs are large (a 1280-program pallas grid plus
# compaction epilogues); persist them so only the first-ever run pays XLA
from ..utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


def _kernel(boff_ref, blen_ref, qoh_ref, planes_hbm, cnt_ref,
            buf, sems, *, chunk: int, qb: int, seg: int, max_dist: int,
            seq_length: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = pl.program_id(0)
    v = pl.program_id(1)
    b0 = boff_ref[s, v]
    blen = blen_ref[s, v]
    nch = pl.cdiv(blen, jnp.int32(chunk))
    qoh = qoh_ref[0, 0].astype(jnp.bfloat16)          # (128, QB)
    segw = chunk // 8                                  # entries per segment

    # neighbours are sites with 1 <= dist <= max_dist, i.e. match count in
    # [seq_length - max_dist, seq_length - 1]; dist == 0 (the query's own
    # site) is located analytically by the epilogue (its bucket rank is not
    # needed: within-bucket order is ascending site id)
    lo_t = jnp.float32(seq_length - max_dist)
    hi_t = jnp.float32(seq_length - 1)

    def dma(slot, c):
        row0 = pl.multiple_of(b0 + c * chunk, ALIGN)
        return pltpu.make_async_copy(
            planes_hbm.at[s, pl.ds(row0, chunk), :], buf.at[slot],
            sems.at[slot])

    cnt_ref[0, 0] = jnp.zeros((2 * seg, qb), jnp.float32)

    @pl.when((blen > 0) & (qb > 0))
    def _():
        dma(0, 0).start()

        def body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()
            entries = buf[slot].astype(jnp.bfloat16)   # (chunk, 128)
            matches = jnp.dot(entries, qoh,
                              preferred_element_type=jnp.float32)
            erows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            hit = ((matches >= lo_t) & (matches <= hi_t)
                   & (erows + c * chunk < blen))

            # hits are sparse: only tiles containing one pay the segmented
            # moment pass (count + position-sum per (segment, slot); a
            # segment with a single hit pins its in-bucket rank exactly —
            # f32 holds ranks < 2^22 exactly). Segments are chunk-local, so
            # these are plain writes (the rest of the row stays zero), and
            # count/pos interleave into one output block row span.
            @pl.when(jnp.any(hit))
            def _():
                hitf = hit.astype(jnp.float32)
                rows = erows.astype(jnp.float32) + jnp.float32(c * chunk)
                cnt8 = jnp.sum(hitf.reshape(8, segw, qb), axis=1)
                pos8 = jnp.sum((hitf * rows).reshape(8, segw, qb), axis=1)
                cnt_ref[0, 0, pl.ds(c * 16, 16), :] = jnp.concatenate(
                    [cnt8, pos8], axis=0)

            return carry

        jax.lax.fori_loop(0, nch, body, 0)


def _onehot_rows(lo, hi, seq_length: int):
    """(n,) uint32 pairs -> (n, 128) int8 one-hot bit-plane rows.

    Lane j = 4*p + b holds ``base(p) == b``. Built as one fused (n, 128)
    elementwise expression (broadcast iota), never materialising per-column
    intermediates — a per-column build tile-pads every (n, 1) slice 128x.
    """
    j = jax.lax.broadcasted_iota(jnp.uint32, (1, LANES), 1)
    p = j >> 2
    b = j & 3
    sh = (2 * p) % 32
    use_hi = p >= 16
    word = jnp.where(use_hi, hi[:, None], lo[:, None])  # (n, 128) uint32
    code = (word >> sh) & 3
    return ((code == b) & (j < 4 * seq_length)).astype(jnp.int8)


class MxuIsslScorer:
    """Bit-exact ISSL scorer: MXU neighbour finder + host oracle replay.

    ``score`` reproduces the reference binary's output exactly (f64, scan
    order, early exit) for every method, at matmul throughput for the
    neighbour-free majority of queries.
    """

    def __init__(self, index: IsslIndex, max_dist: int | None = None,
                 method: str = "and", threshold: float = 75.0,
                 query_page: int = 32768, chunk: int = 4096,
                 nz_cap: int = 1 << 18, interpret: bool | None = None):
        if index.seq_length > 20:
            raise ValueError("one-hot planes support seq_length <= 20")
        if chunk % ALIGN:
            raise ValueError(f"chunk must be a multiple of {ALIGN}")
        self.index = index
        self.max_dist = index.max_dist if max_dist is None else int(max_dist)
        self.method = method
        self.threshold = float(threshold)
        self.query_page = int(query_page)
        self.chunk = int(chunk)
        # static compaction capacities (overflow splits the page in half):
        # single-hit slots, multi-hit slots, their nonzero segment cells,
        # multi-hit segments, rescan hits, and the final hit table
        self.cap_single = int(nz_cap)
        self.cap_mslot = max(1024, int(nz_cap) // 8)
        self.cap_mcell = max(2048, int(nz_cap) // 4)
        self.cap_rescan = max(1024, int(nz_cap) // 16)
        self.cap_rhit = max(2048, int(nz_cap) // 8)
        self.hit_cap = 2 * int(nz_cap)
        self.head_take = 4096
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.S = index.slice_count
        self.B = index.bucket_count

        # HBM feasibility BEFORE any device work: the one-hot planes are
        # S x Epad x 128 int8 (~640 B per site occurrence-slot) — at
        # mammal-genome depth that is tens of GB and the device_put dies
        # with an uncatchable backend error, never reaching the rank
        # bound below. Raise the same ValueError contract so callers
        # (HybridIsslScorer._get_exact) fall back to the exact XLA
        # engine instead of crashing.
        budget = int(os.environ.get("CRACKLING_TPU_MXU_PLANE_BUDGET",
                                    4 << 30))
        # per-slice plane width is Epad — the ALIGN-padded layout
        # device_arrays_aligned produces (every bucket start rounded up
        # to ALIGN plus the chunk tail), not the raw site count; at
        # genome scale with 256 buckets/slice the padding is small, but
        # on skewed or small indexes it can exceed the raw count by
        # whole ALIGN multiples per bucket and the raw estimate
        # under-budgets exactly the OOM this check exists to prevent
        lens = np.diff(index.bucket_offsets, axis=1)
        alens = -(-lens // ALIGN) * ALIGN
        epad = int(alens.sum(axis=1).max()) + self.chunk
        epad = -(-epad // ALIGN) * ALIGN
        need = self.S * epad * 128
        if not self.interpret and need > budget:
            raise ValueError(
                f"one-hot planes need ~{need / 1e9:.1f} GB "
                f"(> {budget / 1e9:.1f} GB budget) at "
                f"{index.num_sites:,} sites; use IsslScorer "
                "(ops/issl_jax.py) for this index")

        self._build_device_planes()

        # lexicographic key array for the self-hit binary search: site ids
        # are assigned in lex order (isslCreateIndex.cpp:184-207), so the
        # id-ordered lex packing is ascending.
        from .. import native
        from ..index.build import _lofirst_to_lex

        lex = native.lex_convert_native(index.site_sigs, index.seq_length)
        self._site_lex = (lex if lex is not None
                          else _lofirst_to_lex(index.site_sigs,
                                               index.seq_length))
        self._runs: dict[int, callable] = {}

    # -- index device layout -------------------------------------------

    def _build_device_planes(self):
        index = self.index
        arrs = index.device_arrays_aligned(align=ALIGN, tail=self.chunk)
        self._epad = arrs["list_lo"].shape[1]
        unpack = jax.jit(functools.partial(_onehot_rows,
                                           seq_length=index.seq_length))
        per_slice = []
        for s in range(self.S):
            lo = jnp.asarray(arrs["list_lo"][s].view(np.uint32))
            hi = jnp.asarray(arrs["list_hi"][s].view(np.uint32))
            per_slice.append(unpack(lo, hi))
        self.planes = jnp.stack(per_slice)             # (S, Epad, 128) int8
        del per_slice
        self.bucket_offsets = jnp.asarray(arrs["bucket_offsets"][:, :-1])
        self.bucket_lens = jnp.asarray(arrs["bucket_lens"])
        self._maxblen = int(arrs["bucket_lens"].max())
        # the hit decoder stores in-bucket ranks in f32 position sums;
        # the kernel's invariant is ranks < 2^22 (comment at the moment
        # pass). An index deep/skewed enough to break it must use the
        # exact XLA engine instead of silently mis-decoding site ids.
        if self._maxblen >= (1 << 22):
            raise ValueError(
                f"bucket with {self._maxblen:,} entries exceeds the MXU "
                "engine's 2^22 rank-exactness bound; use IsslScorer "
                "(ops/issl_jax.py) for this index")
        # device copies for the on-device hit decoding epilogue: packed
        # signatures (aligned layout), the per-slice id lists and the
        # unaligned CSR offsets
        self.list_lo = jnp.asarray(arrs["list_lo"].view(np.uint32))
        self.list_hi = jnp.asarray(arrs["list_hi"].view(np.uint32))
        self.order_dev = jnp.asarray(index.order)
        self.uoff_dev = jnp.asarray(
            index.bucket_offsets.astype(np.int32))     # (S, B+1)

    # -- per-page planning (host) --------------------------------------

    def _plan(self, sigs: np.ndarray):
        """Sort queries into (slice, bucket) slots.

        Returns (qsp, qb): qsp is (S, B, QB) int32 of query ids with
        ``n`` as the padding sentinel; qb is the slot count (multiple of
        128, sized to the fullest bucket so no query is ever dropped)."""
        n = sigs.shape[0]
        vals = self.index.slice_values(sigs).astype(np.int64)   # (S, n)
        counts = np.zeros((self.S, self.B), dtype=np.int64)
        for s in range(self.S):
            counts[s] = np.bincount(vals[s], minlength=self.B)
        max_load = max(1, int(counts.max()))
        qb = max(LANES, ((max_load + LANES - 1) // LANES) * LANES)
        offs = np.zeros((self.S, self.B), dtype=np.int64)
        np.cumsum(counts[:, :-1], axis=1, out=offs[:, 1:])
        # the pad sentinel is the (page-size-independent) zero one-hot row
        qsp = np.full((self.S, self.B * qb), self.query_page, dtype=np.int32)
        ar = np.arange(n, dtype=np.int64)
        for s in range(self.S):
            order = np.argsort(vals[s], kind="stable")
            sv = vals[s][order]
            rank = ar - offs[s][sv]
            qsp[s][sv * qb + rank] = order
        return qsp.reshape(self.S, self.B, qb), qb

    # -- device run -----------------------------------------------------

    @property
    def _seg(self) -> int:
        return max(8, -(-self._maxblen // self.chunk) * 8)

    def _get_run(self, qb: int):
        if qb in self._runs:
            return self._runs[qb]
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, B = self.S, self.B
        seg = self._seg
        call = pl.pallas_call(
            functools.partial(_kernel, chunk=self.chunk, qb=qb, seg=seg,
                              max_dist=self.max_dist,
                              seq_length=self.index.seq_length),
            out_shape=jax.ShapeDtypeStruct((S, B, 2 * seg, qb), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(S, B),
                in_specs=[
                    pl.BlockSpec((1, 1, LANES, qb),
                                 lambda s, v, *_: (s, v, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, 1, 2 * seg, qb),
                                       lambda s, v, *_: (s, v, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, self.chunk, LANES), jnp.int8),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=self.interpret,
        )

        # separate small jits: one fused program spends minutes in XLA
        # wrapping the 1280-program pallas call; split, each compiles in
        # seconds (and the pallas binary is shared across page sizes)
        qpage = self.query_page

        def prelude(packed_in, n):
            # packed_in = [q_lo (n), q_hi (n), qsp (S*B*qb)] — one H2D
            q_lo = packed_in[:n]
            q_hi = packed_in[n:2 * n]
            qsp = packed_in[2 * n:].astype(jnp.int32).reshape(S, B, qb)
            qoh = _onehot_rows(q_lo, q_hi, self.index.seq_length)
            pad = qpage + 1 - n
            qoh = jnp.concatenate(
                [qoh, jnp.zeros((pad, LANES), jnp.int8)], axis=0)
            return jnp.swapaxes(qoh[qsp], 2, 3)        # (S, B, 128, QB)

        segw = self.chunk // 8
        cap1, capm, capm2 = self.cap_single, self.cap_mslot, self.cap_mcell
        capr, capr2, hitcap = self.cap_rescan, self.cap_rhit, self.hit_cap
        head_take = self.head_take
        max_dist = self.max_dist
        # numpy scalars: jnp scalars created here (outside the trace)
        # would be device constants fetched back d2h at lowering time
        even = np.uint32(0xAAAAAAAA)
        odd = np.uint32(0x55555555)

        def epilogue(packed_in, n, out, order_dev, uoff_dev,
                     list_lo, list_hi, boffd, blensd):
            # All hit decoding happens ON DEVICE (tunnel D2H is ~32 ms
            # latency + ~23 MB/s, and host-side index gathers are
            # GIL-bound): slot-level moments resolve single-hit slots
            # directly to site ids; multi-hit slots expand through their
            # segment columns; multi-hit segments are rescanned against the
            # packed signatures. The result is the final compact
            # (query, slice, site-id) hit table.
            q_lo = packed_in[:n]
            q_hi = packed_in[n:2 * n]
            qsp = packed_in[2 * n:].astype(jnp.int32)  # flat (S*B*qb,)
            four = out.reshape(S, B, seg // 8, 2, 8, qb)
            cnt4 = four[:, :, :, 0].reshape(S, B, seg, qb)
            pos4 = four[:, :, :, 1].reshape(S, B, seg, qb)
            slot_cnt = jnp.sum(cnt4, axis=2).reshape(-1)
            slot_pos = jnp.sum(pos4, axis=2).reshape(-1)

            def unravel_slot(i):
                s = i // (B * qb)
                r = i % (B * qb)
                return s, r // qb, r % qb

            def order_at(s_i, b_i, k_i):
                return order_dev[s_i, uoff_dev[s_i, b_i] + k_i]

            # single-hit slots: position-sum IS the in-bucket rank
            one = slot_cnt == 1.0
            n1 = jnp.sum(one.astype(jnp.int32))
            (sidx,) = jnp.nonzero(one, size=cap1, fill_value=-1)
            v1 = sidx >= 0
            s1, b1, _ = unravel_slot(jnp.maximum(sidx, 0))
            k1 = slot_pos[sidx].astype(jnp.int32)
            hid1 = order_at(s1, b1, k1)
            hq1 = qsp[sidx]

            # multi-hit slots -> per-segment cells
            multi = slot_cnt >= 2.0
            nm = jnp.sum(multi.astype(jnp.int32))
            (midx,) = jnp.nonzero(multi, size=capm, fill_value=-1)
            ct = jnp.swapaxes(cnt4, 2, 3).reshape(-1, seg)
            pt = jnp.swapaxes(pos4, 2, 3).reshape(-1, seg)
            vm = (midx >= 0)[:, None]
            mc = jnp.where(vm, ct[midx], 0.0)          # (capm, seg)
            mp = jnp.where(vm, pt[midx], 0.0)
            nc = jnp.sum((mc > 0).astype(jnp.int32))
            (mz,) = jnp.nonzero(mc.reshape(-1), size=capm2, fill_value=-1)
            vz = mz >= 0
            mrow = jnp.maximum(mz, 0) // seg
            msg = jnp.maximum(mz, 0) % seg
            mslot = midx[mrow]
            mcnt = mc.reshape(-1)[jnp.maximum(mz, 0)]
            mpos = mp.reshape(-1)[jnp.maximum(mz, 0)].astype(jnp.int32)
            sM, bM, _ = unravel_slot(jnp.maximum(mslot, 0))
            hqM = qsp[mslot]
            c1 = vz & (mcnt == 1.0)
            hidM = order_at(sM, bM, mpos)

            # multi-hit segments: rescan <=segw entries on device
            c2 = vz & (mcnt >= 2.0)
            n2c = jnp.sum(c2.astype(jnp.int32))
            (ridx,) = jnp.nonzero(c2, size=capr, fill_value=-1)
            vr = ridx >= 0
            ri = jnp.maximum(ridx, 0)
            rs, rb, rseg = sM[ri], bM[ri], msg[ri]
            rq = jnp.maximum(qsp[mslot[ri]], 0)
            start = boffd[rs, rb] + rseg * segw
            cols = jnp.arange(segw, dtype=jnp.int32)[None, :]
            gpos = jnp.minimum(start[:, None] + cols, epad - 1)
            x_lo = list_lo[rs[:, None], gpos] ^ q_lo[rq][:, None]
            x_hi = list_hi[rs[:, None], gpos] ^ q_hi[rq][:, None]
            c_lo = ((x_lo & even) >> 1) | (x_lo & odd)
            c_hi = ((x_hi & even) >> 1) | (x_hi & odd)
            dist = (jax.lax.population_count(c_lo)
                    + jax.lax.population_count(c_hi)).astype(jnp.int32)
            inseg = cols < (blensd[rs, rb] - rseg * segw)[:, None]
            rhit = ((dist >= 1) & (dist <= max_dist) & inseg
                    & vr[:, None])
            nrh = jnp.sum(rhit.astype(jnp.int32))
            (rz,) = jnp.nonzero(rhit.reshape(-1), size=capr2,
                                fill_value=-1)
            vrz = rz >= 0
            rrow = jnp.maximum(rz, 0) // segw
            rcol = jnp.maximum(rz, 0) % segw
            kR = rseg[rrow] * segw + rcol
            hidR = order_at(rs[rrow], rb[rrow], kR)
            hqR = qsp[mslot[ri][rrow]]
            hsR = rs[rrow]

            # assemble + final compaction
            hq_all = jnp.concatenate([hq1, hqM, hqR])
            hs_all = jnp.concatenate([s1, sM, hsR]).astype(jnp.int32)
            hid_all = jnp.concatenate([hid1, hidM, hidR]).astype(jnp.int32)
            val_all = jnp.concatenate([v1, c1, vrz])
            nh = jnp.sum(val_all.astype(jnp.int32))
            (hz,) = jnp.nonzero(val_all, size=hitcap, fill_value=0)
            hits = jnp.stack([hq_all[hz], hs_all[hz], hid_all[hz]])
            header = jnp.stack([nh, n1, nm, nc, n2c, nrh,
                                jnp.int32(0), jnp.int32(0)])
            first = jnp.concatenate(
                [header, hits[:, :head_take].reshape(-1)])
            return first, hits

        epad = self._epad
        # index arrays are ARGUMENTS, never jit-captured constants: a
        # captured device array is embedded in the compiled program, which
        # at genome scale explodes compile payloads (HTTP 413 over the
        # axon remote-compile tunnel) and the compilation cache
        fns = (jax.jit(prelude, static_argnums=1), jax.jit(call),
               jax.jit(epilogue, static_argnums=1))
        self._runs[qb] = fns
        return fns

    def _run_pages(self, sigs: np.ndarray) -> list[tuple]:
        """Kernel + on-device decode over all pages of ``sigs``. Returns
        per-(sub)page tuples ``(page, counts, hq, hs, hid)`` where
        hq/hs/hid is the page's compact hit table (page-local query index,
        slice, site id). Compaction overflow splits a page and retries."""
        out = []

        def run_one(page):
            n = page.shape[0]
            qsp, qb = self._plan(page)
            lo, hi = sig_split(page)
            prelude, kcall, epilogue = self._get_run(qb)
            packed_in = jnp.asarray(np.concatenate(
                [lo.view(np.uint32), hi.view(np.uint32),
                 qsp.reshape(-1).view(np.uint32)]))
            gathered = prelude(packed_in, n)
            kout = kcall(self.bucket_offsets, self.bucket_lens,
                         gathered, self.planes)
            first_d, hits_d = epilogue(
                packed_in, n, kout, self.order_dev, self.uoff_dev,
                self.list_lo, self.list_hi, self.bucket_offsets,
                self.bucket_lens)
            first = np.asarray(first_d)
            nh, n1, nm, nc, n2c, nrh = (int(x) for x in first[:6])
            if (n1 > self.cap_single or nm > self.cap_mslot
                    or nc > self.cap_mcell or n2c > self.cap_rescan
                    or nrh > self.cap_rhit or nh > self.hit_cap):
                if n < 2:
                    raise RuntimeError("hit compaction overflow on a single "
                                       "query; raise the engine caps")
                run_one(page[:n // 2])
                run_one(page[n // 2:])
                return
            if nh <= self.head_take:
                hits = first[8:8 + 3 * self.head_take].reshape(3, -1)[:, :nh]
            else:
                hits = np.asarray(hits_d[:, :nh])
            hq, hs, hid = (hits[0].astype(np.int64),
                           hits[1].astype(np.int64),
                           hits[2].astype(np.int64))
            counts = np.bincount(hq, minlength=n).astype(np.float64)
            out.append((page, counts, hq, hs, hid))

        for j in range(0, sigs.shape[0], self.query_page):
            run_one(sigs[j:j + self.query_page])
        return out

    def neighbour_counts(self, query_sigs: np.ndarray) -> np.ndarray:
        """Per-query count of (slice-discoverable, pre-dedup) sites at
        distance 1..max_dist — the kernel's raw output."""
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        return np.concatenate(
            [r[1] for r in self._run_pages(sigs)]) if sigs.size else \
            np.zeros(0, dtype=np.float64)

    # -- hit decoding (host) -------------------------------------------

    def _self_lookup(self, sigs: np.ndarray):
        """Binary search each query in the lex-sorted site list.
        Returns (found, site_id, occurrences)."""
        from .. import native
        from ..index.build import _lofirst_to_lex

        if self.index.num_sites == 0:
            z = np.zeros(sigs.shape[0], dtype=np.int64)
            return np.zeros(sigs.shape[0], dtype=bool), z, z
        qlex = native.lex_convert_native(sigs, self.index.seq_length)
        if qlex is None:
            qlex = _lofirst_to_lex(sigs, self.index.seq_length)
        pos = np.searchsorted(self._site_lex, qlex)
        pos = np.minimum(pos, self.index.num_sites - 1)
        found = self._site_lex[pos] == qlex
        occ = np.where(found, self.index.occurrences[pos].astype(np.int64), 0)
        return found, pos.astype(np.int64), occ

    # -- exact replay (host, f64, vectorized) --------------------------

    def _replay_page(self, page, hq, hs, hid, method, threshold,
                     mit_out, cfd_out, qmap):
        """Accumulate each query's hits in exact reference order
        (isslScoreOfftargets.cpp:308-511): hits sorted by (slice, site id)
        — within-bucket list order IS ascending id — deduped by first
        occurrence, f64 sums with the score-visible early exit. The per-hit
        arithmetic is vectorized; only the tiny running-sum loop is Python.
        ``qmap`` maps page-local query index -> output row."""
        from .tables import (CFD_PAM_NGG_INDEX, cfd_pam_penalties,
                             cfd_pos_penalties)
        from ..codec import popcount64

        idx = self.index
        calc_mit = method in ("mit", "and", "or", "avg")
        calc_cfd = method in ("cfd", "and", "or", "avg")
        maximum_sum = (10000.0 - threshold * 100.0) / threshold

        o = np.lexsort((hid, hs, hq))
        hq, hs, hid = hq[o], hs[o], hid[o]
        n_hits = hq.shape[0]
        if n_hits == 0:
            return
        # dedup: first occurrence of (query, site) in scan order
        composite = hq.astype(np.uint64) * np.uint64(idx.num_sites + 1) \
            + hid.astype(np.uint64)
        _, first = np.unique(composite, return_index=True)
        keep = np.zeros(n_hits, dtype=bool)
        keep[first] = True

        qsig = page[hq]
        sig = idx.site_sigs[hid]
        occ = idx.occurrences[hid].astype(np.float64)
        x = qsig ^ sig
        even = np.uint64(0xAAAAAAAAAAAAAAAA)
        odd = np.uint64(0x5555555555555555)
        mask40 = ((x & even) >> np.uint64(1)) | (x & odd)
        dist = popcount64(mask40)

        if calc_mit:
            # precalc-map lookup via unique masks (<= 6195 distinct values;
            # avoids building the 2^20-entry dense table)
            if not hasattr(self, "_precalc"):
                from .tables import precalculated_mit_scores

                self._precalc = precalculated_mit_scores(
                    idx.seq_length, self.max_dist)
            um, inv = np.unique(mask40, return_inverse=True)
            uvals = np.array([self._precalc.get(int(m), 0.0) for m in um],
                             dtype=np.float64)
            mit_c = np.where(dist > 0, uvals[inv], 0.0) * occ
        else:
            mit_c = np.zeros(n_hits, dtype=np.float64)
        if calc_cfd:
            pos_pen = cfd_pos_penalties()
            pam = float(cfd_pam_penalties()[CFD_PAM_NGG_INDEX])
            # sequential in position order (vectorized across hits) so the
            # f64 product is bit-identical to the reference's loop
            c = np.full(n_hits, pam, dtype=np.float64)
            for p in range(idx.seq_length):
                sh = np.uint64(2 * p)
                qb_ = ((qsig >> sh) & np.uint64(3)).astype(np.int64)
                ob = ((sig >> sh) & np.uint64(3)).astype(np.int64)
                pen = pos_pen[p, (qb_ << 2) | (ob ^ 3)]
                c = c * np.where(qb_ != ob, pen, 1.0)
            cfd_c = np.where(dist == 0, 1.0, c) * occ
        else:
            cfd_c = np.zeros(n_hits, dtype=np.float64)

        # per-query sequential accumulation with the reference early exit:
        # the one inherently-serial-per-query recurrence. Native path runs
        # it in C, parallel across queries (replay.cpp — identical f64 adds
        # in identical order, so sums stay bit-exact); without a toolchain
        # the Python loop below computes the same thing
        bounds = np.flatnonzero(np.diff(hq)) + 1
        starts = np.concatenate([[0], bounds, [n_hits]])
        heads = hq[starts[:-1]]
        from .. import native

        acc = native.replay_accumulate_native(
            starts, mit_c, cfd_c, keep, method, maximum_sum)
        if acc is not None:
            m_arr, cc_arr = acc
            rows = qmap[heads]
            mit_out[rows] = 10000.0 / (100.0 + m_arr)
            cfd_out[rows] = 10000.0 / (100.0 + cc_arr)
            return
        mit_l = mit_c.tolist()
        cfd_l = cfd_c.tolist()
        keep_l = keep.tolist()
        for g in range(heads.shape[0]):
            i0, i1 = int(starts[g]), int(starts[g + 1])
            m = 0.0
            cc = 0.0
            for i in range(i0, i1):
                if not keep_l[i]:
                    continue
                m += mit_l[i]
                cc += cfd_l[i]
                if method == "and":
                    if m > maximum_sum and cc > maximum_sum:
                        break
                elif method == "or":
                    if m > maximum_sum or cc > maximum_sum:
                        break
                elif method == "avg":
                    if (m + cc) / 2.0 > maximum_sum:
                        break
                elif method == "mit":
                    if m > maximum_sum:
                        break
                else:  # cfd
                    if cc > maximum_sum:
                        break
            row = qmap[int(heads[g])]
            mit_out[row] = 10000.0 / (100.0 + m)
            cfd_out[row] = 10000.0 / (100.0 + cc)

    # -- public API ------------------------------------------------------

    def score(self, query_sigs: np.ndarray, method: str | None = None,
              threshold: float | None = None):
        """Reference-exact (mit, cfd) scores, already 10000/(100+sum)."""
        method = self.method if method is None else method
        threshold = self.threshold if threshold is None else float(threshold)
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        n = sigs.shape[0]
        calc_cfd = method in ("cfd", "and", "or", "avg")

        mit = np.full(n, 100.0, dtype=np.float64)
        cfd = np.full(n, 100.0, dtype=np.float64)
        if n == 0:
            return mit, cfd

        off = 0
        for (page, counts, hq, hs, hid) in self._run_pages(sigs):
            pn = page.shape[0]
            rows = np.arange(off, off + pn)
            flagged = counts > 0
            found, sid_self, occ_self = self._self_lookup(page)

            # neighbour-free queries: the only possible hit is the query's
            # own site — dist 0 gives MIT 0 and CFD occurrences
            # (isslScoreOfftargets.cpp:393,407-408); no exit can truncate a
            # single-hit scan, so this is the exact reference result
            if calc_cfd:
                clean = ~flagged
                cfd[rows[clean]] = 10000.0 / (100.0 + occ_self[clean]
                                              .astype(np.float64))

            if flagged.any():
                # self-hits of flagged queries: present in every slice's
                # bucket; ordering needs only (slice, id), both known
                fs = np.flatnonzero(flagged & found)
                if fs.size:
                    hq = np.concatenate(
                        [hq, np.repeat(fs, self.S)])
                    hs = np.concatenate(
                        [hs, np.tile(np.arange(self.S), fs.size)])
                    hid = np.concatenate(
                        [hid, np.repeat(sid_self[fs], self.S)])
                self._replay_page(page, hq, hs, hid, method, threshold,
                                  mit, cfd, qmap=rows)
            off += pn
        return mit, cfd
