"""Focused: why is HashTable.lookup slow in the aligner context?"""
import sys, os, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cellranger_tpu.ops.hash_index import HashTable


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.time()-t0)/iters*1000:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    B = 32768

    for nkeys, name in ((100_000, "wl-sized (2^19 slots)"),
                        (20_000_000, "kmer-sized (2^26 slots)")):
        keys = np.unique(rng.integers(0, 2**32, nkeys, np.uint64).astype(np.uint32))
        t = HashTable.build(keys, np.arange(len(keys), dtype=np.uint32))
        print(f"{name}: slots=2^{t.bits}")

        q1 = jnp.asarray(rng.integers(0, 2**32, B, np.uint64).astype(np.uint32))
        member = jax.jit(lambda tt, q: tt.membership(q))
        timeit(f"  membership [B] probe={t.probe}", member, t, q1)

        q2 = jnp.asarray(rng.integers(0, 2**32, (2*B, 10), np.uint64).astype(np.uint32))
        lookup8 = jax.jit(lambda tt, q: tt.lookup(q, probe=8))
        timeit("  lookup [2B,10] probe=8", lookup8, t, q2)

        # raw gather only (no hash, no compare)
        ix = jnp.asarray(rng.integers(0, t.slots - 8, (2*B, 10), np.uint64).astype(np.int32))
        raw = jax.jit(lambda tt, ix: tt.kv[ix[..., None] + jnp.arange(8)].sum())
        timeit("  raw 8-window gather [2B,10]", raw, t, ix)

        # hash-derived indices (tests whether the hash computation breaks
        # XLA's gather lowering)
        hashed = jax.jit(lambda tt, q: tt.kv[
            jnp.minimum(((q * jnp.uint32(0x9E3779B9)) >> jnp.uint32(32 - tt.bits))
                        .astype(jnp.int32)[..., None] + jnp.arange(8, dtype=jnp.int32),
                        tt.slots - 1)].sum())
        timeit("  hash+minimum-index gather [2B,10]", hashed, t, q2)


if __name__ == "__main__":
    main()
