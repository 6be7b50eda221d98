"""Bisect the extension stage at 3.1GB: ablate1 showed seed+lookup+vote+
window-fetch = ~36ms but align_core = 319ms; ~285ms hides between the
candidate fetch and the locus count.  Times cumulative sub-stages e1..e6
(each includes all previous), mirroring aligner.py's extension exactly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

READ_LEN = 91
BATCH = int(os.environ.get("CRTPU_H3G_BATCH", 32768))


def main():
    import jax
    import jax.numpy as jnp
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    from cellranger_tpu.align.index import GenomeIndex, MINIMIZER_HASH
    from cellranger_tpu.align.aligner import (
        DeviceIndex, MAX_HITS_PER_SEED, MAX_CANDIDATES, _rolling_kmers,
        _window_valid, _minimizer_picks, make_window_fetch)
    from cellranger_tpu.ops.encode import revcomp_packed

    t0 = time.time()
    gi = GenomeIndex.load(os.path.join(repo, ".bench_cache",
                                       "human3g_idx.npz"))
    print(f"npz load {time.time()-t0:.0f}s", flush=True)
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
    D = MAX_CANDIDATES + 1
    N_OFF = 5
    BIGK = jnp.uint32(0xFFFFFFFF)
    BIG = jnp.int32(2**31 - 1)
    glen = jnp.uint32(didx.genome_len)
    n_sj = int(didx.sj_rows.shape[0])
    contig_len = jnp.uint32(2 * didx.sj_overhang)
    fetch_win = make_window_fetch(didx, L + N_OFF - 1)

    rng = np.random.default_rng(9)
    pos = rng.integers(0, gi.genome_len - READ_LEN - 1, BATCH)
    rna = jnp.asarray(gi.text[pos[:, None] + np.arange(READ_LEN)[None, :]]
                      .astype(np.uint8))
    nmask = jnp.ones((BATCH, READ_LEN), bool)

    def through(idx, rna, nmask, stage: int):
        B = rna.shape[0]
        rc = (3 - rna[:, ::-1]).astype(jnp.uint8)
        rc_mask = nmask[:, ::-1]
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
        off = off_s[:, :, None]
        hit, val = idx.kmer_table.lookup(canon)
        hit = hit & kv[:, :, None]
        pos_h = val & jnp.uint32(0xFFFFFFFE)
        sbit = (val & jnp.uint32(1)).astype(jnp.int32)
        strand_h = sbit ^ flip[:, :, None].astype(jnp.int32)
        offterm = jnp.where(strand_h == 0, off, L - k - off).astype(jnp.uint32)
        ok = hit & (pos_h >= offterm)
        diag = pos_h - offterm
        key = (diag & jnp.uint32(0xFFFFFFFC)) | strand_h.astype(jnp.uint32)
        key = jnp.where(ok, key, BIGK)
        M = S * H
        flat = key.reshape(B, M)
        kval2 = flat != BIGK
        eq = flat[:, None, :] == flat[:, :, None]
        votes_all = jnp.sum((eq & kval2[:, None, :]).astype(jnp.int32), axis=2)
        tri = jnp.tril(jnp.ones((M, M), bool), -1)
        earlier = jnp.any(eq & tri[None, :, :], axis=2)
        votes = jnp.where(kval2 & ~earlier, votes_all, 0)
        top_votes, top_i = jax.lax.top_k(votes, D)
        cand_key = jnp.take_along_axis(flat, top_i, axis=1)
        cand_ok = top_votes > 0
        cand_pos = cand_key & jnp.uint32(0xFFFFFFFC)
        cand_strand = (cand_key & jnp.uint32(1)).astype(jnp.int32)

        codes_d = jnp.where(cand_strand[:, :, None] == 1,
                            rc[:, None, :], rna[:, None, :])
        mask_d = jnp.where(cand_strand[:, :, None] == 1,
                           rc_mask[:, None, :], nmask[:, None, :])
        win, wok = fetch_win(idx, jnp.where(cand_ok, cand_pos, 0))
        if stage == 1:
            return win.sum(dtype=jnp.uint32), wok.sum(), codes_d.sum(dtype=jnp.uint32)

        sub = np.arange(0, L, 5, dtype=np.int32)
        wins = jnp.stack([win[..., o:o + L][..., sub]
                          for o in range(N_OFF)], 2)
        woks = jnp.stack([wok[..., o:o + L][..., sub]
                          for o in range(N_OFF)], 2)
        act5 = mask_d[:, :, None, sub] & woks
        m5 = (wins == codes_d[:, :, None, sub]) & act5
        net = (2 * jnp.sum(m5, -1, dtype=jnp.int32)
               - jnp.sum(act5, -1, dtype=jnp.int32))
        best_off = jnp.argmax(net, axis=2).astype(jnp.int32)
        if stage == 2:
            return best_off.sum(), net.sum()

        gidx = best_off[:, :, None] + jnp.arange(L, dtype=jnp.int32)
        win2 = jnp.take_along_axis(win, gidx, axis=2)
        wok2 = jnp.take_along_axis(wok, gidx, axis=2)
        cand_pos2 = cand_pos + best_off.astype(cand_pos.dtype)
        if stage == 3:
            return win2.sum(dtype=jnp.uint32), wok2.sum()

        m = (win2 == codes_d) & wok2 & mask_d
        active = mask_d & wok2
        contrib = jnp.where(active, jnp.where(m, 1, -1), 0).astype(jnp.int32)
        cs = jnp.cumsum(contrib, axis=2)
        pref = jnp.pad(cs, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        run_min = jax.lax.cummax(-pref, axis=2)
        best_at = cs + run_min
        score = jnp.max(best_at, axis=2)
        if stage == 4:
            return score.sum(), best_at.sum()

        end_i = jnp.argmax(best_at, axis=2)
        li = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        pref_masked = jnp.where(li <= end_i[:, :, None], pref, BIG)
        start_i = jnp.argmin(pref_masked, axis=2)
        aln_len = (end_i - start_i + 1).astype(jnp.int32)
        start_i = start_i.astype(jnp.int32)
        score = jnp.where(cand_ok, score, -BIG)
        if stage == 5:
            return score.sum(), aln_len.sum(), start_i.sum()

        def canonical_pos(idx, pos):
            pos = pos.astype(jnp.uint32)
            in_sj = pos >= glen
            j = jnp.where(in_sj, (pos - glen) // contig_len, 0).astype(jnp.int32)
            row = idx.sj_rows[j]
            offj = jnp.where(in_sj, (pos - glen) % contig_len, 0)
            donor_start = row[..., 0] - jnp.uint32(idx.sj_overhang)
            canon_sj = jnp.where(offj < idx.sj_overhang,
                                 donor_start + offj,
                                 row[..., 1] + offj - jnp.uint32(idx.sj_overhang))
            return jnp.where(in_sj, canon_sj, pos)

        best_score = jnp.max(score, axis=1)
        is_best = score == best_score[:, None]
        if stage == 55:  # skip canonical_pos: identity
            canon2 = (jnp.where(cand_ok, cand_pos2, 0).astype(jnp.uint32)
                      + start_i.astype(jnp.uint32))
        else:
            canon2 = (canonical_pos(idx, jnp.where(cand_ok, cand_pos2, 0))
                      .astype(jnp.uint32) + start_i.astype(jnp.uint32))
        ckey = (canon2 & jnp.uint32(0xFFFFFFFE)) | cand_strand.astype(jnp.uint32)
        ckey_full = ckey
        ckey = jnp.where(is_best & (score > -BIG), ckey_full, BIGK)
        ckey_sorted = jnp.sort(ckey, axis=1)
        distinct = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             ckey_sorted[:, 1:] != ckey_sorted[:, :-1]], axis=1)
        n_best = jnp.sum(
            jnp.where(distinct & (ckey_sorted != BIGK), 1, 0), axis=1)
        n_diags = jnp.sum((votes > 0).astype(jnp.int32), axis=1)
        ckey_any = jnp.where(cand_ok & (score > -BIG), ckey_full, BIGK)
        any_sorted = jnp.sort(ckey_any, axis=1)
        distinct_any = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             any_sorted[:, 1:] != any_sorted[:, :-1]], axis=1)
        n_exam = jnp.sum(
            jnp.where(distinct_any & (any_sorted != BIGK), 1, 0), axis=1)
        saturated = (n_diags > D) & (n_best >= n_exam) & (n_best >= 1)
        n_best = jnp.where(saturated, jnp.clip(n_diags, D + 1, 5), n_best)
        pick = jnp.argmin(ckey, axis=1)
        take = lambda a: jnp.take_along_axis(a, pick[:, None], axis=1)[:, 0]
        return (take(cand_pos2).sum(dtype=jnp.uint32), take(cand_strand).sum(),
                n_best.sum(), best_score.sum())

    import functools
    for stage in (1, 2, 3, 4, 5, 55, 6):
        fn = jax.jit(functools.partial(through, stage=stage),
                     static_argnames=())
        t0 = time.time()
        out = jax.block_until_ready(fn(didx, rna, nmask))
        t_first = time.time() - t0
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            out = fn(didx, rna, nmask)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"e{stage:<3d} first {t_first:7.1f}s  warm {dt*1000:9.2f} ms "
              f"({BATCH/dt/1000:8.1f}k reads/s)", flush=True)


if __name__ == "__main__":
    main()
