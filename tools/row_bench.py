"""Ground-truth gather cost vs row width (np.asarray sync per iter)."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def measure(table, idx, iters=5):
    @jax.jit
    def g(t, ix):
        return t[ix].sum()
    r = np.asarray(g(table, idx))
    t0 = time.time()
    for _ in range(iters):
        r = np.asarray(g(table, idx))
    dt = (time.time() - t0) / iters
    return dt


def main():
    rng = np.random.default_rng(0)
    N_ROWS_GATHER = 1 << 20  # 1M row fetches
    for tbl_mb in (16, 512):
        total_u32 = tbl_mb * (1 << 20) // 4
        print(f"--- table {tbl_mb} MB ---")
        for row_u32 in (2, 4, 8, 16, 32, 64):
            nrows = total_u32 // row_u32
            table = jnp.asarray(
                rng.integers(0, 2**32, (nrows, row_u32), np.uint64).astype(np.uint32))
            idx = jnp.asarray(rng.integers(0, nrows, N_ROWS_GATHER).astype(np.int32))
            dt = measure(table, idx)
            ns = dt / N_ROWS_GATHER * 1e9
            bw = N_ROWS_GATHER * row_u32 * 4 / dt / 1e9
            print(f"row {row_u32*4:4d}B: {dt*1000:8.2f} ms for 1M rows"
                  f" -> {ns:6.1f} ns/row, {bw:7.1f} GB/s")
            del table
    # contiguous 2-row window (r, r+1) vs 2 independent gathers
    total_u32 = 512 * (1 << 20) // 4
    row_u32 = 8
    nrows = total_u32 // row_u32
    table = jnp.asarray(
        rng.integers(0, 2**32, (nrows, row_u32), np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, nrows - 2, N_ROWS_GATHER).astype(np.int32))

    @jax.jit
    def g2(t, ix):
        return t[jnp.stack([ix, ix + 1], -1)].sum()
    r = np.asarray(g2(table, idx))
    t0 = time.time()
    for _ in range(5):
        r = np.asarray(g2(table, idx))
    dt = (time.time() - t0) / 5
    print(f"2-row window 32B rows: {dt*1000:8.2f} ms for 1M windows"
          f" -> {dt/N_ROWS_GATHER*1e9:6.1f} ns/window")


main()
