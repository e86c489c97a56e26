"""Multi-chip ISSL scoring: index sharding + data-parallel query streams.

The scaling design (SURVEY.md §2.3/§7.9): the ISSL index is sharded by
**site-id range** across devices — every site keeps all of its slice-bucket
entries on one shard, so the first-clean-slice dedup stays shard-local and
exact — while query pages are either replicated (index-parallel only) or
split along a second data-parallel axis. Each device scores the full query
page against its shard; per-query MIT/CFD partial sums merge with ``psum``
over the shard axis (the reference's per-thread accumulators + implicit
reduction, isslScoreOfftargets.cpp:308-509, re-expressed as an XLA
collective riding ICI); the 10000/(100+sum) transform and thresholding
happen after the merge.

Early-exit emulation is not applied across shards (the reference's exit
point depends on a global scan order that sharding interleaves); sharded
scoring always computes full sums, which preserves verdicts for the
mit/cfd/and/or methods and scores of accepted guides everywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import sig_split
from ..index.build import IsslIndex
from ..ops.issl_jax import ScorerConfig, score_page_core
from ..ops.tables import CFD_PAM_NGG_INDEX, cfd_pam_penalties, cfd_pos_penalties


def shard_index(index: IsslIndex, n_shards: int) -> list[IsslIndex]:
    """Split an index into ``n_shards`` site-id-contiguous sub-indexes."""
    n = index.num_sites
    bounds = [(n * k) // n_shards for k in range(n_shards + 1)]
    shards = []
    for k in range(n_shards):
        lo, hi = bounds[k], bounds[k + 1]
        shards.append(
            IsslIndex(
                seq_length=index.seq_length,
                slice_width=index.slice_width,
                seq_count=int(index.occurrences[lo:hi].sum()),
                site_sigs=index.site_sigs[lo:hi].copy(),
                occurrences=index.occurrences[lo:hi].copy(),
            )
        )
    return shards


def shard_bounds(num_sites: int, n_shards: int) -> list[tuple[int, int]]:
    """Deterministic site-range split — every host computes the same
    bounds (and hence the same pad size) from the global site count."""
    b = [(num_sites * k) // n_shards for k in range(n_shards + 1)]
    return [(b[k], b[k + 1]) for k in range(n_shards)]


class ShardedIsslScorer:
    """ISSL scorer over a device mesh.

    Single-process meshes: ('shard',) or ('q', 'shard'). Multi-host
    meshes (jax.distributed): ('host', 'q', 'shard') with the index
    sharded over ``index_axes = ('host', 'shard')`` — the partial-sum
    merge then psums over both axes, crossing DCN on 'host' and ICI on
    'shard'. Construct with :meth:`from_local_shards` in multi-host mode
    so each process only ever materializes its own site ranges
    (SURVEY.md §2.3 distributed-backend row).
    """

    def __init__(
        self,
        index: IsslIndex | None,
        mesh: Mesh,
        max_dist: int | None = None,
        query_block: int = 256,
        work_block: int = 1 << 16,
        dtype=jnp.float32,
        index_axes: tuple[str, ...] = ("shard",),
        _local: dict | None = None,
    ):
        for a in index_axes:
            if a not in mesh.axis_names:
                raise ValueError(f"mesh must have a {a!r} axis")
        self.mesh = mesh
        self.index_axes = tuple(index_axes)
        self.n_shards = int(np.prod([mesh.shape[a] for a in self.index_axes]))
        self.n_q = mesh.shape.get("q", 1)
        self.has_q_axis = "q" in mesh.axis_names
        self.query_block = int(query_block)
        self.dtype = jnp.dtype(dtype)
        spec_sharded = P(self.index_axes)

        if _local is None:
            shards = shard_index(index, self.n_shards)
            npad = max(s.num_sites for s in shards)
            stacked = {k: [] for k in ("list_lo", "list_hi", "list_occ",
                                       "bucket_offsets")}
            for s in shards:
                arrs = s.device_arrays(pad_to=npad)
                for k in stacked:
                    stacked[k].append(arrs[k])
            stacked = {k: np.stack(v) for k, v in stacked.items()}
            meta = dict(seq_length=index.seq_length,
                        slice_width=index.slice_width,
                        slice_count=index.slice_count,
                        max_dist=index.max_dist)

            def put(a, p):
                return jax.device_put(a, NamedSharding(mesh, p))
        else:
            stacked, npad, meta = (_local["stacked"], _local["npad"],
                                   _local["meta"])

            def put(a, p):
                sh = NamedSharding(mesh, p)
                rows = self.n_shards  # global leading dim
                return jax.make_array_from_process_local_data(
                    sh, a, (rows,) + a.shape[1:])

        self.list_lo = put(
            stacked["list_lo"].reshape(stacked["list_lo"].shape[0], -1)
            .view(np.uint32), spec_sharded)
        self.list_hi = put(
            stacked["list_hi"].reshape(stacked["list_hi"].shape[0], -1)
            .view(np.uint32), spec_sharded)
        self.list_occ = put(
            stacked["list_occ"].reshape(stacked["list_occ"].shape[0], -1),
            spec_sharded)
        self.bucket_offsets = put(stacked["bucket_offsets"], spec_sharded)
        self.pos_pen = put(
            np.broadcast_to(
                cfd_pos_penalties().reshape(-1).astype(self.dtype),
                (stacked["bucket_offsets"].shape[0], 320),
            ).copy(),
            spec_sharded,
        )

        self.cfg = ScorerConfig(
            slice_count=meta["slice_count"],
            slice_width=meta["slice_width"],
            work_block=int(work_block),
            max_dist=meta["max_dist"] if max_dist is None else int(max_dist),
            npad=npad,
            pam_ngg=float(cfd_pam_penalties()[CFD_PAM_NGG_INDEX]),
            dtype=str(self.dtype),
            method=None,
            maximum_sum=None,
        )
        self._step = self._build_step()

    @classmethod
    def from_local_shards(
        cls,
        local_shards: list[IsslIndex],
        mesh: Mesh,
        global_num_sites: int,
        *,
        max_dist: int | None = None,
        query_block: int = 256,
        work_block: int = 1 << 16,
        dtype=jnp.float32,
        index_axes: tuple[str, ...] = ("host", "shard"),
    ):
        """Multi-host construction: this process supplies only its own
        site-range shards (in global shard order for this host's rows of
        the index axes); the global device array is assembled across
        processes without any host materializing the full index."""
        n_shards = int(np.prod([mesh.shape[a] for a in index_axes]))
        bounds = shard_bounds(global_num_sites, n_shards)
        npad = max(hi - lo for lo, hi in bounds)
        stacked = {k: [] for k in ("list_lo", "list_hi", "list_occ",
                                   "bucket_offsets")}
        for s in local_shards:
            arrs = s.device_arrays(pad_to=npad)
            for k in stacked:
                stacked[k].append(arrs[k])
        stacked = {k: np.stack(v) for k, v in stacked.items()}
        s0 = local_shards[0]
        meta = dict(seq_length=s0.seq_length, slice_width=s0.slice_width,
                    slice_count=s0.slice_count, max_dist=s0.max_dist)
        return cls(None, mesh, max_dist=max_dist, query_block=query_block,
                   work_block=work_block, dtype=dtype, index_axes=index_axes,
                   _local=dict(stacked=stacked, npad=npad, meta=meta))

    def _build_step(self):
        cfg = self.cfg
        mesh = self.mesh
        index_axes = self.index_axes

        def per_device(q_lo, q_hi, q_valid, list_lo, list_hi, list_occ,
                       bucket_offsets, pos_pen):
            mit, cfd = score_page_core(
                cfg, q_lo, q_hi, q_valid,
                list_lo[0], list_hi[0], list_occ[0], bucket_offsets[0],
                pos_pen[0],
            )
            # merge partial sums across index shards: ICI on 'shard',
            # DCN on 'host' when the mesh has one
            mit = jax.lax.psum(mit, axis_name=index_axes)
            cfd = jax.lax.psum(cfd, axis_name=index_axes)
            return mit, cfd

        qspec = P("q") if self.has_q_axis else P()
        shard_spec = P(self.index_axes)
        mapped = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(qspec, qspec, qspec, shard_spec, shard_spec,
                      shard_spec, shard_spec, shard_spec),
            out_specs=(qspec, qspec),
        )
        return jax.jit(mapped)

    def _to_global(self, arr: np.ndarray):
        """Host numpy -> global device array (replicated over 'host')."""
        if jax.process_count() == 1:
            return jnp.asarray(arr)
        spec = P("q") if self.has_q_axis else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), arr, arr.shape)

    @staticmethod
    def _to_local(arr) -> np.ndarray:
        """Global device array -> host numpy. Works in multi-host mode
        because query outputs are replicated over 'host': this process's
        addressable shards cover the full global array."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        out = np.empty(arr.shape, arr.dtype)
        for sh in arr.addressable_shards:
            out[sh.index] = np.asarray(sh.data)
        return out

    def score_sums(self, query_sigs: np.ndarray):
        sigs = np.asarray(query_sigs, dtype=np.uint64)
        n = sigs.shape[0]
        qb = self.query_block * self.n_q
        mit = np.zeros(n, dtype=np.float64)
        cfd = np.zeros(n, dtype=np.float64)
        for i in range(0, n, qb):
            chunk = sigs[i:i + qb]
            pad = qb - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros(pad, dtype=np.uint64)])
            lo, hi = sig_split(chunk)
            q_valid = np.arange(qb) < (qb - pad)
            m, c = self._step(
                self._to_global(lo.view(np.uint32)),
                self._to_global(hi.view(np.uint32)),
                self._to_global(q_valid),
                self.list_lo, self.list_hi, self.list_occ,
                self.bucket_offsets, self.pos_pen,
            )
            m = self._to_local(m).astype(np.float64)
            c = self._to_local(c).astype(np.float64)
            mit[i:i + qb] = m[: qb - pad] if pad else m
            cfd[i:i + qb] = c[: qb - pad] if pad else c
        return mit, cfd

    def score(self, query_sigs: np.ndarray):
        mit_sum, cfd_sum = self.score_sums(query_sigs)
        return 10000.0 / (100.0 + mit_sum), 10000.0 / (100.0 + cfd_sum)


def make_mesh(n_shards: int | None = None, n_q: int = 1,
              devices=None) -> Mesh:
    """Build a ('q', 'shard') mesh over ``devices`` (default: all)."""
    devices = np.array(jax.devices() if devices is None else devices)
    if n_shards is None:
        n_shards = devices.size // n_q
    use = devices[: n_q * n_shards].reshape(n_q, n_shards)
    return Mesh(use, axis_names=("q", "shard"))
