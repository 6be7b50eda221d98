"""Micro-benchmark: random-gather formulations on TPU.

Hypothesis: XLA TPU gathers cost ~per-row (latency/descriptor bound), so
fetching fewer, wider rows beats many 8-byte rows.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.time()-t0)/iters*1000:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    SLOTS = 1 << 19

    B = 32768
    # seed-lookup shape: [2B, 10] queries, 8-slot probe window, kv pairs
    Q = 2 * B * 10

    idx = jnp.asarray(rng.integers(0, SLOTS - 16, Q).astype(np.int32))

    t_flat = jnp.asarray(rng.integers(0, 2**32, (SLOTS, 2), np.uint64).astype(np.uint32))

    @jax.jit
    def slot_gather(t, ix):
        sl = ix[:, None] + jnp.arange(8)
        return t[sl].sum()  # [Q, 8, 2]

    timeit(f"8x slot-gather [slots,2] rows (Q={Q})", slot_gather, t_flat, idx)

    t_row8 = jnp.asarray(rng.integers(0, 2**32, (SLOTS // 8, 8, 2), np.uint64).astype(np.uint32))

    @jax.jit
    def row_gather2(t, ix):
        r = ix >> 3
        rows = t[jnp.stack([r, r + 1], -1)]  # [Q, 2, 8, 2]
        return rows.sum()

    timeit("2x row-gather [slots/8,8,2] rows", row_gather2, t_row8, idx)

    t_row16 = jnp.asarray(rng.integers(0, 2**32, (SLOTS // 16, 16, 2), np.uint64).astype(np.uint32))

    @jax.jit
    def row_gather2w(t, ix):
        r = ix >> 4
        rows = t[jnp.stack([r, r + 1], -1)]  # [Q, 2, 16, 2]
        return rows.sum()

    timeit("2x row-gather [slots/16,16,2] rows (128B)", row_gather2w, t_row16, idx)

    @jax.jit
    def row_gather1(t, ix):
        r = ix >> 4
        rows = t[r]  # [Q, 16, 2]
        return rows.sum()

    timeit("1x row-gather [slots/16,16,2] row (128B)", row_gather1, t_row16, idx)

    # flat 1D gather of single u32
    t1d = jnp.asarray(rng.integers(0, 2**32, SLOTS, np.uint64).astype(np.uint32))

    @jax.jit
    def gather1d(t, ix):
        return t[ix].sum()

    timeit("1x scalar gather u32 from 1D", gather1d, t1d, idx)

    # same but fewer queries (the [B] whitelist membership shape)
    idx_small = idx[:B]
    timeit(f"1x scalar gather u32 (Q={B})", gather1d, t1d, idx_small)

    @jax.jit
    def gather_sorted(t, ix):
        return t[jnp.sort(ix)].sum()

    timeit("sort + 1x scalar gather", gather_sorted, t1d, idx)


if __name__ == "__main__":
    main()
