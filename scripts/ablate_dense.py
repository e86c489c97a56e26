"""Dense-kernel time breakdown by ablation (real chip).

Monkeypatches crackling_tpu.ops.issl_dense._kernel with reduced
variants and times a full 64K-query page scan on the bench index for
each. The deltas attribute wall time to the kernel's three cost
centers: the 5 weight matmuls, the per-(site, query) scoring epilogue
(popcount/ctz/clz + 2 exps + MIT arithmetic), and the DMA/unpack
skeleton. Timing only — ablated variants return garbage scores.

Findings drive optimization choices; results append to
scripts/ablate_dense_results.jsonl.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def make_kernel(variant: str):
    """variant: full | no-epilogue | mask-only | mask-only-epilogue."""
    import jax
    import jax.numpy as jnp

    def _kernel(boff_ref, blen_ref, wts_ref, entries_hbm,
                mit_ref, cfd_ref, buf, sems,
                *, chunk, qb, max_dist, pam_ngg, rows_per_slice):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        LANES = 128
        ALIGN = 1024
        cg = chunk // LANES
        s = pl.program_id(0)
        v = pl.program_id(1)
        b0 = boff_ref[s, v]
        blen = blen_ref[s, v]
        nch = pl.cdiv(blen, jnp.int32(chunk))
        row_base = s * rows_per_slice + b0 // LANES

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
                lo2 = buf[slot, 0]
                hi2 = buf[slot, 1]
                occt = jnp.transpose(
                    buf[slot, 2].astype(jnp.int32).astype(jnp.float32))

                for g in range(cg):
                    if variant == "dma-only":
                        acc_mit = acc_mit + occt[:, g:g + 1]
                        acc_cfd = acc_cfd + occt[:, g:g + 1]
                        continue
                    lo_b = jnp.broadcast_to(lo2[g:g + 1, :], (LANES, LANES))
                    hi_b = jnp.broadcast_to(hi2[g:g + 1, :], (LANES, LANES))
                    word = jnp.where(use_hi, hi_b, lo_b)
                    code = (word >> sh) & jnp.uint32(3)
                    e = (code == jb).astype(jnp.bfloat16)
                    if variant == "unpack-only":
                        # depend on every element of e without a matmul
                        # (a *0 term would be constant-folded away)
                        acc_mit = (acc_mit + occt[:, g:g + 1]
                                   + jnp.min(e, axis=1, keepdims=True
                                             ).astype(jnp.float32))
                        acc_cfd = acc_cfd + occt[:, g:g + 1]
                        continue

                    maskf = dot(e, wm)
                    if variant in ("full", "no-epilogue"):
                        mit_log = dot(e, wt_hi) + dot(e, wt_lo)
                        cfd_log = dot(e, wc_hi) + dot(e, wc_lo)
                    else:
                        mit_log = maskf
                        cfd_log = maskf

                    if variant in ("full", "mask-only-epilogue"):
                        mi_raw = maskf.astype(jnp.int32)
                        dist = jax.lax.population_count(mi_raw)
                        x = mi_raw.astype(jnp.uint32) | ~low_mask
                        seen_earlier = ((x - jnp.uint32(0x11111111)) & ~x
                                        & jnp.uint32(0x88888888)) != 0
                        in_bucket = (site_sub + (g * LANES)
                                     + c * chunk) < blen
                        valid = ((dist <= max_dist) & ~seen_earlier
                                 & in_bucket)
                        mi = jnp.maximum(mi_raw, 1)
                        first = jax.lax.population_count((mi & -mi) - 1)
                        last = 31 - jax.lax.clz(mi)
                        m = dist.astype(jnp.float32)
                        md = jnp.maximum(m - 1.0, 1.0)
                        u = jnp.where(dist == 1, jnp.float32(19.0),
                                      (last - first).astype(jnp.float32))
                        t1 = jnp.exp2(mit_log)
                        den = (95.0 * md - 4.0 * u) * jnp.maximum(m * m, 1.0)
                        mit_local = jnp.where(
                            dist > 0, t1 * (1900.0 * md) / den, 0.0)
                        cfd_local = jnp.where(
                            dist == 0, jnp.float32(1.0),
                            pam_ngg * jnp.exp2(cfd_log))
                        vf = jnp.where(valid, occt[:, g:g + 1], 0.0)
                        acc_mit = acc_mit + mit_local * vf
                        acc_cfd = acc_cfd + cfd_local * vf
                    else:
                        # timing skeleton: keep data deps, skip epilogue
                        vf = occt[:, g:g + 1]
                        acc_mit = acc_mit + mit_log * vf
                        acc_cfd = acc_cfd + cfd_log * vf
                return acc_mit, acc_cfd

            acc_mit, acc_cfd = jax.lax.fori_loop(
                0, nch, body,
                (jnp.zeros((LANES, qb), jnp.float32),
                 jnp.zeros((LANES, qb), jnp.float32)))
            mit_ref[0, 0] = acc_mit.reshape(LANES // 8, 8, qb).sum(axis=0)
            cfd_ref[0, 0] = acc_cfd.reshape(LANES // 8, 8, qb).sum(axis=0)

    return _kernel


def main():
    from bench import ensure_dataset

    index_npz, _issl, qfile = ensure_dataset()
    import crackling_tpu.ops.issl_dense as dense_mod
    from crackling_tpu.codec import strings_to_sigs
    from crackling_tpu.index import load_native

    index = load_native(str(index_npz))
    sigs = strings_to_sigs([s.strip() for s in open(qfile)], 20)
    page = 65536
    sigs = np.tile(sigs, -(-page // len(sigs)))[:page]

    results = {}
    orig = dense_mod._kernel
    for variant in ["full", "no-epilogue", "mask-only-epilogue",
                    "mask-only", "unpack-only", "dma-only"]:
        if variant == "full":
            dense_mod._kernel = orig
        else:
            k = make_kernel(variant)
            dense_mod._kernel = functools.partial(k)
        scorer = dense_mod.DenseIsslScorer(index)
        scorer.score(sigs)                    # compile + warm
        t = min((lambda t0: (scorer.score(sigs), time.time() - t0)[1])(
            time.time()) for _ in range(3))
        results[variant] = round(t, 4)
        print(f"{variant:22s} {t:.4f} s  ({page / t:,.0f} q/s)",
              flush=True)
    dense_mod._kernel = orig
    with open(ROOT / "scripts" / "ablate_dense_results.jsonl", "a") as fp:
        fp.write(json.dumps(results) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
