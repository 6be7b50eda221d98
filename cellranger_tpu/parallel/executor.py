"""Execution context: one object that hides single-chip vs multi-chip.

`run_count` builds an Executor once and calls it per batch; whether the
fused counting step runs on one device or SPMD over a jax.sharding.Mesh is
decided here, nowhere else.  This is the production wiring of the mesh
(VERDICT r1 item 1): batches shard over the `data` axis, the whitelist
bucket table is replicated, scalar metrics psum, and per-partition dedup
fans out one barcode-hash partition per device (parallel/mesh.py).

Multi-host: when `jax.process_count() > 1` (jax.distributed initialized,
see parallel/distributed.py), the mesh spans hosts; each host feeds its own
FASTQ subset and the psum/metric merges ride DCN.  Host-side spill files
live under the (shared) output directory, mirroring the reference's
shared-filesystem shardio exchange.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_sharded_step, make_sharded_part_dedup
from ..ops.dedup import dedup_molecules


def _pow2(n: int, minimum: int = 1024) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


# dedup output packing: one [N, 12] int32 plane = ONE device->host fetch
# per partition instead of 12 (each fetch is a round trip on tunneled
# backends; measured ~45s of a 5M-read run's dedup phase).  Runs without
# BAM/feature consumers fetch only the 5 molecule columns (raw-triple
# views unused): the 48MB-per-million-rows readback drops ~58%.
DD_FIELDS = ("mol_bc", "mol_gene", "mol_umi", "mol_reads", "mol_valid",
             "raw_bc", "raw_gene", "raw_umi", "raw_corr_umi", "raw_low",
             "raw_is_repr", "raw_reads")
DD_FIELDS_MOL = DD_FIELDS[:5]
DD_U32 = frozenset(("mol_bc", "mol_gene", "mol_umi", "raw_bc", "raw_gene",
                    "raw_umi", "raw_corr_umi"))


def _pack_dd(dd: dict, fields):
    cols = []
    for k in fields:
        a = dd[k]
        if a.dtype == jnp.uint32:
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
        cols.append(a.astype(jnp.int32))
    return jnp.stack(cols, axis=1)


def _unpack_dd(plane: np.ndarray) -> dict:
    fields = DD_FIELDS if plane.shape[1] == len(DD_FIELDS) else DD_FIELDS_MOL
    out = {}
    for j, k in enumerate(fields):
        col = plane[:, j]
        out[k] = col.view(np.uint32) if k in DD_U32 else col
    return out


import functools


@functools.partial(jax.jit, static_argnames=("umi_len", "keep_raw"),
                   donate_argnums=(0, 1, 2, 3))
def _dedup_packed(bc, gene, umi, valid, umi_len: int,
                  keep_raw: bool = True):
    dd = dedup_molecules(bc, gene, umi, valid, umi_len)
    dd.pop("n_molecules")
    return _pack_dd(dd, DD_FIELDS if keep_raw else DD_FIELDS_MOL)


class Executor:
    """Single- or multi-chip execution of the counting hot path."""

    def __init__(self, mesh: Mesh | None = None, axis: str = "data"):
        if mesh is not None and mesh.devices.size == 1:
            mesh = None  # degenerate mesh: run the plain single-chip path
        self.mesh = mesh
        self.axis = axis
        self.n_devices = mesh.devices.size if mesh is not None else 1
        self._sharding = (NamedSharding(mesh, P(axis))
                          if mesh is not None else None)
        self._dedup_fns: dict[int, object] = {}

    def round_batch(self, batch_size: int) -> int:
        """Round the batch size up so it splits evenly across devices."""
        n = self.n_devices
        return -(-batch_size // n) * n

    def put(self, a):
        """Device-put one batch array (dim 0 sharded when on a mesh)."""
        if self._sharding is None:
            return jnp.asarray(a)
        return jax.device_put(np.asarray(a), self._sharding)

    def wrap_step(self, step_fn, n_batch_args: int = 1):
        if self.mesh is None:
            return step_fn
        return make_sharded_step(step_fn, self.mesh, self.axis,
                                 n_batch_args=n_batch_args)

    def dedup_partitions(self, parts, umi_len: int,
                         chunk_limit: int = 1 << 21,
                         keep_raw: bool = True):
        """Dedup barcode-disjoint molecule partitions.

        parts: iterable of (bc, gene, umi) numpy row arrays; each partition
        holds complete barcodes.  Yields one host-side dict per device call
        with compacted molecule rows and raw-triple views:
          mol_bc/gene/umi/reads (valid molecules only),
          raw_bc/gene/umi/corr_umi/low (distinct raw triples only).
        On a mesh, n_devices partitions run per SPMD call (padded to a
        common power-of-two length; dedup output is pad-invariant since
        invalid rows carry sentinel keys).
        """
        parts = list(parts)
        if self.mesh is None:
            # COALESCE bc-disjoint partitions into as few device calls as
            # possible (each call is 1+ round trips on tunneled backends;
            # 16 partition calls cost seconds of pure latency), capped at
            # chunk_limit rows of working set; one COMMON padded shape
            # across groups so dedup compiles once
            groups: list[list] = []
            cur: list = []
            cur_n = 0
            for p in parts:
                n = len(p[0])
                if cur and cur_n + n > chunk_limit:
                    groups.append(cur)
                    cur, cur_n = [], 0
                cur.append(p)
                cur_n += n
            if cur:
                groups.append(cur)
            N = _pow2(max((sum(len(p[0]) for p in g) for g in groups),
                          default=1))
            for g in groups:
                bc = np.concatenate([p[0] for p in g])
                gene = np.concatenate([p[1] for p in g])
                umi = np.concatenate([p[2] for p in g])
                yield self._dedup_host(bc, gene, umi, umi_len, N,
                                       keep_raw=keep_raw)
            return
        n = self.n_devices
        for i in range(0, len(parts), n):
            group = parts[i:i + n]
            real = len(group)
            while len(group) < n:
                group.append((np.zeros(0, np.uint32),) * 3)
            N = _pow2(max(max(len(g[0]) for g in group), 1))
            stack = {k: np.zeros((n, N), np.uint32)
                     for k in ("bc", "gene", "umi")}
            valid = np.zeros((n, N), bool)
            for d, (bc, gene, umi) in enumerate(group):
                stack["bc"][d, :len(bc)] = bc
                stack["gene"][d, :len(gene)] = gene
                stack["umi"][d, :len(umi)] = umi
                valid[d, :len(bc)] = True
            if N not in self._dedup_fns:
                self._dedup_fns[N] = make_sharded_part_dedup(
                    self.mesh, umi_len, self.axis)
            plane = self._dedup_fns[N](
                self.put(stack["bc"].reshape(-1)),
                self.put(stack["gene"].reshape(-1)),
                self.put(stack["umi"].reshape(-1)),
                self.put(valid.reshape(-1)))
            host = np.asarray(plane).reshape(n, N, len(DD_FIELDS))
            for d in range(real):
                yield self._compact(_unpack_dd(host[d]))

    def _dedup_host(self, bc, gene, umi, umi_len, N: int | None = None,
                    keep_raw: bool = True):
        N = N or _pow2(max(len(bc), 1))
        pad = N - len(bc)
        plane = _dedup_packed(
            jnp.asarray(np.pad(np.asarray(bc, np.uint32), (0, pad))),
            jnp.asarray(np.pad(np.asarray(gene, np.uint32), (0, pad))),
            jnp.asarray(np.pad(np.asarray(umi, np.uint32), (0, pad))),
            jnp.asarray(np.pad(np.ones(len(bc), bool), (0, pad))),
            umi_len, keep_raw)
        return self._compact(_unpack_dd(np.asarray(plane)))

    @staticmethod
    def _compact(dd: dict) -> dict:
        mv = dd["mol_valid"].astype(bool)
        out = dict(
            mol_bc=dd["mol_bc"][mv], mol_gene=dd["mol_gene"][mv],
            mol_umi=dd["mol_umi"][mv], mol_reads=dd["mol_reads"][mv])
        if "raw_is_repr" in dd:
            rr = dd["raw_is_repr"].astype(bool)
            out.update(
                raw_bc=dd["raw_bc"][rr], raw_gene=dd["raw_gene"][rr],
                raw_umi=dd["raw_umi"][rr],
                raw_corr_umi=dd["raw_corr_umi"][rr],
                raw_low=dd["raw_low"][rr].astype(bool),
                raw_reads=dd["raw_reads"][rr])
        return out
