"""Stage-by-stage timing of the 3.1GB-genome step on the real chip.

The gather_cliff microbench shows a full step's worth of random 64B-row
gathers from an 8GB table costs ~0.03ms — so the 391ms step at GRCh38
scale is NOT raw gather cost, and the r4 "gather-bound" diagnosis needs a
profile. Loads the cached .bench_cache/human3g_idx.npz once, then times:

  seed_pick    kmers + minimizer winnowing + top_k compaction (no HBM table)
  seed_lookup  + the kmer_table bucket-row gather (8.6GB table)
  vote         + O(M^2) diagonal voting + top_k
  align_core   make_aligner(novel_sj=False, sw_rescue=False)
  align_nsj    + novel-SJ discovery
  align_full   + SW rescue
  full_step    _make_step (align + annotate + dedup-key packing)

Each stage includes everything before it; the deltas are the profile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

READ_LEN = 91
BATCH = int(os.environ.get("CRTPU_H3G_BATCH", 32768))


def timeit(name, fn, *args, iters=5):
    import jax
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:18s} first {t_first:7.1f}s  warm {dt*1000:9.2f} ms "
          f"({BATCH/dt/1000:8.1f}k reads/s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    from cellranger_tpu.align.index import GenomeIndex, MINIMIZER_HASH
    from cellranger_tpu.align.aligner import (
        DeviceIndex, MAX_HITS_PER_SEED, _rolling_kmers, _window_valid,
        _minimizer_picks, make_aligner, make_window_fetch)
    from cellranger_tpu.ops.encode import revcomp_packed

    t0 = time.time()
    gi = GenomeIndex.load(os.path.join(repo, ".bench_cache",
                                       "human3g_idx.npz"))
    print(f"npz load {time.time()-t0:.0f}s text={len(gi.text)} "
          f"pos_mode={gi.pos_mode} w={gi.minimizer_w}", flush=True)

    t0 = time.time()
    didx = DeviceIndex.from_host(gi)
    jax.block_until_ready((didx.kmer_table.rows, didx.text_rows))
    print(f"device index ready {time.time()-t0:.0f}s", flush=True)

    k = didx.k
    L = READ_LEN
    from cellranger_tpu.params import get as _param
    headroom = float(_param("minimizer_seed_headroom"))
    S = max(8, int(np.ceil(headroom * 2 * (L - k + 1)
                           / (didx.minimizer_w + 1))))
    H = MAX_HITS_PER_SEED * didx.kmer_table.probe_rows
    D = 4  # MAX_CANDIDATES + 1 parity slot
    BIGK = jnp.uint32(0xFFFFFFFF)
    print(f"S={S} H={H} M={S*H}", flush=True)

    rng = np.random.default_rng(9)
    pos = rng.integers(0, gi.genome_len - READ_LEN - 1, BATCH)
    rna = jnp.asarray(gi.text[pos[:, None] + np.arange(READ_LEN)[None, :]]
                      .astype(np.uint8))
    nmask = jnp.ones((BATCH, READ_LEN), bool)

    # ---- stage 1: seed picking only ----
    @jax.jit
    def seed_pick(idx, rna, nmask):
        kms = _rolling_kmers(rna, k)
        kvalid = _window_valid(nmask, k)
        n = kms.shape[1]
        kmr_all = revcomp_packed(kms, k)
        flip_all = kmr_all < kms
        canon_all = jnp.where(flip_all, kmr_all, kms)
        mh = canon_all * jnp.uint32(MINIMIZER_HASH)
        mh = jnp.where(kvalid, mh, BIGK)
        picked = _minimizer_picks(mh, idx.minimizer_w) & kvalid
        sc = jnp.where(picked,
                       n - jnp.arange(n, dtype=jnp.int32)[None, :], 0)
        top_s, _ = jax.lax.top_k(sc, S)
        kv = top_s > 0
        off_s = jnp.where(kv, n - top_s, 0)
        take_s = lambda a: jnp.take_along_axis(a, off_s, axis=1)
        canon = take_s(canon_all)
        flip = take_s(flip_all)
        return canon.sum(dtype=jnp.uint32), flip.sum(), kv.sum()

    def stage12(idx, rna, nmask, sort_gather):
        kms = _rolling_kmers(rna, k)
        kvalid = _window_valid(nmask, k)
        n = kms.shape[1]
        kmr_all = revcomp_packed(kms, k)
        flip_all = kmr_all < kms
        canon_all = jnp.where(flip_all, kmr_all, kms)
        mh = canon_all * jnp.uint32(MINIMIZER_HASH)
        mh = jnp.where(kvalid, mh, BIGK)
        picked = _minimizer_picks(mh, idx.minimizer_w) & kvalid
        sc = jnp.where(picked,
                       n - jnp.arange(n, dtype=jnp.int32)[None, :], 0)
        top_s, _ = jax.lax.top_k(sc, S)
        kv = top_s > 0
        off_s = jnp.where(kv, n - top_s, 0)
        take_s = lambda a: jnp.take_along_axis(a, off_s, axis=1)
        canon = take_s(canon_all)
        if sort_gather:
            flatq = canon.reshape(-1)
            order = jnp.argsort(flatq)
            hit_f, val_f = idx.kmer_table.lookup(flatq[order])
            inv = jnp.argsort(order)
            hit = hit_f[inv].reshape(BATCH, S, -1)
            val = val_f[inv].reshape(BATCH, S, -1)
        else:
            hit, val = idx.kmer_table.lookup(canon)
        return hit, val, kv

    @jax.jit
    def seed_lookup(idx, rna, nmask):
        hit, val, kv = stage12(idx, rna, nmask, False)
        return hit.sum(), val.sum(dtype=jnp.uint32)

    @jax.jit
    def seed_lookup_sorted(idx, rna, nmask):
        hit, val, kv = stage12(idx, rna, nmask, True)
        return hit.sum(), val.sum(dtype=jnp.uint32)

    @jax.jit
    def vote(idx, rna, nmask):
        hit, val, kv = stage12(idx, rna, nmask, False)
        pos_h = val & jnp.uint32(0xFFFFFFFE)
        sbit = (val & jnp.uint32(1)).astype(jnp.int32)
        ok = hit & kv[:, :, None]
        key = (pos_h & jnp.uint32(0xFFFFFFFC)) | sbit.astype(jnp.uint32)
        key = jnp.where(ok, key, BIGK)
        M = S * H
        flat = key.reshape(BATCH, M)
        kval = flat != BIGK
        eq = flat[:, None, :] == flat[:, :, None]
        votes_all = jnp.sum((eq & kval[:, None, :]).astype(jnp.int32), axis=2)
        tri = jnp.tril(jnp.ones((M, M), bool), -1)
        earlier = jnp.any(eq & tri[None, :, :], axis=2)
        votes = jnp.where(kval & ~earlier, votes_all, 0)
        top_votes, top_i = jax.lax.top_k(votes, D)
        cand_key = jnp.take_along_axis(flat, top_i, axis=1)
        return top_votes.sum(), cand_key.sum(dtype=jnp.uint32)

    # ---- window-fetch isolated: D gathers/read from the 1.6GB text ----
    fetch_win = make_window_fetch(didx, L + 4)
    cand_pos = jnp.asarray(
        rng.integers(0, gi.genome_len - 200, (BATCH, D)).astype(np.uint32))

    @jax.jit
    def window_fetch(idx, cp):
        win, wok = fetch_win(idx, cp)
        return win.sum(dtype=jnp.uint32), wok.sum()

    timeit("seed_pick", seed_pick, didx, rna, nmask)
    timeit("seed_lookup", seed_lookup, didx, rna, nmask)
    timeit("seed_lookup_sorted", seed_lookup_sorted, didx, rna, nmask)
    timeit("vote", vote, didx, rna, nmask)
    timeit("window_fetch", window_fetch, didx, cand_pos)

    aln_core = make_aligner(didx, READ_LEN, sw_rescue=False, novel_sj=False)
    timeit("align_core", aln_core, rna, nmask)
    aln_nsj = make_aligner(didx, READ_LEN, sw_rescue=False, novel_sj=True)
    timeit("align_nsj", aln_nsj, rna, nmask)
    aln_full = make_aligner(didx, READ_LEN)
    timeit("align_full", aln_full, rna, nmask)


if __name__ == "__main__":
    main()
