"""Why does the 8.6GB kmer-table gather run 8x slower per row than 280MB?

Measures, on the real chip, N=327680 row-gathers (the per-step count of a
32768-read batch with ~10 seeds/read) from tables of growing size:

  plain     : table[idx] with random idx          (what the aligner does now)
  sorted-ix : table[sort(idx)]                    (locality ceiling: is the
              cliff about access order at all?)
  sgu       : sort + gather + scatter-back-unsort (deployable version)

Run: python tools/gather_cliff.py [--sizes 0.5,2,4,8]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

ROW_U32 = 16           # 64B rows like the kmer BucketTable
N_GATHER = 32768 * 10  # per-step row count at batch 32768


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="0.25,1,2,4,8")
    ap.add_argument("--n", type=int, default=N_GATHER)
    args = ap.parse_args()
    sizes_gb = [float(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)

    @jax.jit
    def plain(t, ix):
        return t[ix].sum(dtype=jnp.uint32)

    @jax.jit
    def sgu(t, ix):
        order = jnp.argsort(ix)
        rows = t[ix[order]]
        inv = jnp.argsort(order)
        return rows[inv].sum(dtype=jnp.uint32)

    for gb in sizes_gb:
        nrows = int(gb * (1 << 30)) // (ROW_U32 * 4)
        # build on device without a huge host array: iota-based fill
        t = jax.jit(lambda n=nrows: (
            jnp.arange(n, dtype=jnp.uint32)[:, None]
            * jnp.arange(1, ROW_U32 + 1, dtype=jnp.uint32)[None, :]))()
        t = jax.block_until_ready(t)
        ix = jnp.asarray(rng.integers(0, nrows, args.n).astype(np.int32))
        ix_sorted = jnp.sort(ix)

        dt_p, _ = timeit(plain, t, ix)
        dt_s, _ = timeit(plain, t, ix_sorted)
        dt_g, _ = timeit(sgu, t, ix)
        n = args.n
        print(f"table {gb:5.2f} GB ({nrows} rows): "
              f"plain {dt_p*1000:8.2f} ms ({dt_p/n*1e9:6.1f} ns/row) | "
              f"sorted-ix {dt_s*1000:8.2f} ms ({dt_s/n*1e9:6.1f} ns/row) | "
              f"sort+gather+unsort {dt_g*1000:8.2f} ms ({dt_g/n*1e9:6.1f} ns/row)",
              flush=True)
        del t


if __name__ == "__main__":
    main()
