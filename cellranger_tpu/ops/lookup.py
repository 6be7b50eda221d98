"""Bucketed sorted-array lookup: the shared membership primitive.

A sorted uint32 key array plus a prefix table over the top `bits` bits gives
O(1) bucket range + a short in-bucket binary search — a handful of HBM
gathers per query instead of a 25-step global binary search. Used for both
the genome kmer index and the barcode whitelist (whitelist.rs:494's hash
probe analog).

The in-bucket search runs as a fori_loop with an iteration count derived
from the actual max bucket occupancy at build time (kept opaque to XLA: an
unrolled compare chain feeding a sort triggers a pathological XLA:CPU fusion
— see align/aligner.py history).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass


def _ceil_log2(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


@register_dataclass
@dataclass(frozen=True)
class SortedTable:
    """Device arrays for bucketed lookup over sorted uint32 keys.

    Registered as a jax pytree (keys/bucket_starts are leaves; bits/n_iters
    static metadata) so tables pass through jit boundaries."""

    keys: jnp.ndarray           # uint32 [P] sorted
    bucket_starts: jnp.ndarray  # uint32 [2^bits + 1]
    bits: int = field(metadata=dict(static=True), default=22)
    n_iters: int = field(metadata=dict(static=True), default=13)

    @staticmethod
    def build(sorted_keys: np.ndarray, bits: int = 22,
              max_search: int = 4096) -> "SortedTable":
        sorted_keys = np.asarray(sorted_keys, np.uint32)
        nb = 1 << bits
        buckets = sorted_keys >> np.uint32(32 - bits)
        starts = np.searchsorted(buckets, np.arange(nb + 1, dtype=np.uint64)
                                 ).astype(np.uint32)
        occupancy = np.diff(starts)
        max_occ = int(occupancy.max()) if len(sorted_keys) else 1
        n_iters = _ceil_log2(min(max(max_occ, 1), max_search)) + 1
        return SortedTable(keys=jnp.asarray(sorted_keys),
                           bucket_starts=jnp.asarray(starts),
                           bits=bits, n_iters=n_iters)

    def lower_bound(self, q: jnp.ndarray) -> jnp.ndarray:
        """Leftmost index i with keys[i] >= q; int32, same shape as q."""
        P = self.keys.shape[0]
        if P == 0:
            return jnp.zeros(q.shape, jnp.int32)
        b = (q >> (32 - self.bits)).astype(jnp.int32)
        lo = self.bucket_starts[b].astype(jnp.int32)
        hi = self.bucket_starts[b + 1].astype(jnp.int32)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) >> 1
            v = self.keys[jnp.clip(mid, 0, P - 1)]
            go = (v < q) & (mid < hi)
            return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

        lo, hi = jax.lax.fori_loop(0, self.n_iters, body, (lo, hi))
        return lo

    def membership(self, q: jnp.ndarray):
        """(is_member bool, index int32 (-1 on miss)) for each query."""
        P = self.keys.shape[0]
        if P == 0:
            return jnp.zeros(q.shape, bool), jnp.full(q.shape, -1, jnp.int32)
        lo = self.lower_bound(q)
        loc = jnp.clip(lo, 0, P - 1)
        hit = self.keys[loc] == q
        return hit, jnp.where(hit, loc, -1)
