"""Seed-pick stage microbench (no index needed): current top_k +
take_along_axis compaction vs a one-hot-matmul compaction (MXU) vs a
scatter-based one.  The stage was 12.4ms of the 45.6ms 280MB step."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cellranger_tpu.align.aligner import (_rolling_kmers, _window_valid,
                                          _minimizer_picks)
from cellranger_tpu.align.index import MINIMIZER_HASH
from cellranger_tpu.ops.encode import revcomp_packed

B, L, K, W, S = 32768, 91, 16, 12, 10
BIGK = jnp.uint32(0xFFFFFFFF)


def common(rna, nmask):
    kms = _rolling_kmers(rna, K)
    kvalid = _window_valid(nmask, K)
    n = kms.shape[1]
    kmr_all = revcomp_packed(kms, K)
    flip_all = kmr_all < kms
    canon_all = jnp.where(flip_all, kmr_all, kms)
    mh = canon_all * jnp.uint32(MINIMIZER_HASH)
    mh = jnp.where(kvalid, mh, BIGK)
    picked = _minimizer_picks(mh, W) & kvalid
    return canon_all, flip_all, picked, n


@jax.jit
def cur(rna, nmask):
    canon_all, flip_all, picked, n = common(rna, nmask)
    sc = jnp.where(picked, n - jnp.arange(n, dtype=jnp.int32)[None, :], 0)
    top_s, _ = jax.lax.top_k(sc, S)
    kv = top_s > 0
    off_s = jnp.where(kv, n - top_s, 0)
    take_s = lambda a: jnp.take_along_axis(a, off_s, axis=1)
    canon = take_s(canon_all)
    flip = take_s(flip_all)
    return canon.sum(dtype=jnp.uint32), flip.sum(), off_s.sum(), kv.sum()


@jax.jit
def onehot(rna, nmask):
    canon_all, flip_all, picked, n = common(rna, nmask)
    rank = jnp.cumsum(picked.astype(jnp.int32), axis=1) - 1  # [B, n]
    # T[b, i, r] = picked & rank == r  (f32 for the MXU)
    T = (picked[:, :, None]
         & (rank[:, :, None] == jnp.arange(S)[None, None, :])
         ).astype(jnp.float32)                               # [B, n, S]
    iota = jnp.arange(n, dtype=jnp.float32)[None, :]
    off_f = jnp.einsum("bi,bis->bs", iota, T)
    hi = (canon_all >> 16).astype(jnp.float32)
    lo = (canon_all & jnp.uint32(0xFFFF)).astype(jnp.float32)
    c_hi = jnp.einsum("bi,bis->bs", hi, T)
    c_lo = jnp.einsum("bi,bis->bs", lo, T)
    fl = jnp.einsum("bi,bis->bs", flip_all.astype(jnp.float32), T)
    kv = jnp.sum(T, axis=1) > 0
    canon = ((c_hi.astype(jnp.uint32) << 16)
             | c_lo.astype(jnp.uint32))
    flip = fl > 0.5
    off_s = off_f.astype(jnp.int32)
    return canon.sum(dtype=jnp.uint32), flip.sum(), \
        jnp.where(kv, off_s, 0).sum(), kv.sum()


@jax.jit
def scat(rna, nmask):
    canon_all, flip_all, picked, n = common(rna, nmask)
    rank = jnp.cumsum(picked.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(picked & (rank < S), rank, S)
    bi = jnp.broadcast_to(jnp.arange(B)[:, None], (B, n))
    canon = jnp.zeros((B, S + 1), jnp.uint32).at[bi, slot].set(
        canon_all, mode="drop")[:, :S]
    flip = jnp.zeros((B, S + 1), bool).at[bi, slot].set(
        flip_all, mode="drop")[:, :S]
    off = jnp.full((B, S + 1), 0, jnp.int32).at[bi, slot].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n)),
        mode="drop")[:, :S]
    kv = jnp.zeros((B, S + 1), bool).at[bi, slot].set(
        True, mode="drop")[:, :S]
    return canon.sum(dtype=jnp.uint32), flip.sum(), off.sum(), kv.sum()


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:8s} {(time.time()-t0)/iters*1000:7.2f} ms  out={[int(np.asarray(o)) for o in out]}",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    rna = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.uint8))
    nmask = jnp.ones((B, L), bool)

    @jax.jit
    def base(rna, nmask):
        canon_all, flip_all, picked, n = common(rna, nmask)
        return canon_all.sum(dtype=jnp.uint32), picked.sum()

    timeit("base", base, rna, nmask)
    timeit("cur", cur, rna, nmask)
    timeit("onehot", onehot, rna, nmask)
    timeit("scat", scat, rna, nmask)


if __name__ == "__main__":
    main()
