"""Human-scale step cost breakdown on real TPU (VERDICT r3 item 2):
times the full step plus successively smaller prefixes of the aligner
pipeline so the 71ms step can be attributed to seed-pick/lookup, vote
sort, extension+offset-refine, rescue/novel-SJ, and annotate/pack.

Uses the cached 280MB human-scale index (.bench_cache/human_idx.npz from
bench.py).  Each variant is a fresh compile (minutes on the tunneled
backend) — run alone.

Usage: python tools/step_ablate.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
READ_LEN = 91


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))

    from cellranger_tpu.align.index import GenomeIndex, MINIMIZER_HASH
    from cellranger_tpu.align.aligner import (
        DeviceIndex, make_aligner, _rolling_kmers, _window_valid,
        _minimizer_picks, MAX_CANDIDATES)
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.ops.encode import revcomp_packed
    from cellranger_tpu.pipeline.count import _make_step, pack_step_input
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome

    idx_path = os.path.join(repo, ".bench_cache", "human_idx.npz")
    t0 = time.time()
    gi = GenomeIndex.load(idx_path)
    print(f"index load {time.time()-t0:.0f}s genome_len={gi.genome_len} "
          f"sampling={gi.sampling} w={gi.minimizer_w} "
          f"pos_mode={gi.pos_mode}", file=sys.stderr)
    didx = DeviceIndex.from_host(gi)
    print(f"kmer_table probe_rows={didx.kmer_table.probe_rows} "
          f"rows={didx.kmer_table.rows.shape}", file=sys.stderr)

    # reads drawn from the genome text + 2 errors (bench-identical load)
    rng = np.random.default_rng(3)
    pos = rng.integers(0, gi.genome_len - READ_LEN - 1, BATCH)
    rna = gi.text[pos[:, None] + np.arange(READ_LEN)[None, :]].astype(np.uint8)
    for j in range(2):
        rna[np.arange(BATCH), rng.integers(0, READ_LEN, BATCH)] ^= 1
    nmask = np.ones((BATCH, READ_LEN), bool)
    rna_j = jnp.asarray(rna)
    nmask_j = jnp.asarray(nmask)

    def timeit(name, fn, *args, iters=5, windows=3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        t_c = time.time() - t0
        for _ in range(2):
            jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters)
        print(f"{name:32s} {best*1e3:8.2f} ms  (compile {t_c:.0f}s)",
              flush=True)
        return best

    k, L = gi.k, READ_LEN
    MINI = gi.sampling == "minimizer"
    from cellranger_tpu.params import get as _param
    headroom = float(_param("minimizer_seed_headroom"))
    S = max(8, int(np.ceil(headroom * 2 * (L - k + 1)
                           / (gi.minimizer_w + 1)))) if MINI else 8
    H = 8 * didx.kmer_table.probe_rows
    print(f"S={S} H={H} M={S*H} D={MAX_CANDIDATES}", file=sys.stderr)
    BIGK = jnp.uint32(0xFFFFFFFF)

    @jax.jit
    def seeds_lookup(idx, rna, nmask):
        kms = _rolling_kmers(rna, k)
        kvalid = _window_valid(nmask, k)
        n = kms.shape[1]
        kmr_all = revcomp_packed(kms, k)
        flip_all = kmr_all < kms
        canon_all = jnp.where(flip_all, kmr_all, kms)
        mh = canon_all * jnp.uint32(MINIMIZER_HASH)
        mh = jnp.where(kvalid, mh, BIGK)
        picked = _minimizer_picks(mh, gi.minimizer_w) & kvalid
        sc = jnp.where(picked,
                       n - jnp.arange(n, dtype=jnp.int32)[None, :], 0)
        top_s, _ = jax.lax.top_k(sc, S)
        kv = top_s > 0
        off_s = jnp.where(kv, n - top_s, 0)
        canon = jnp.take_along_axis(canon_all, off_s, axis=1)
        hit, val = idx.kmer_table.lookup(canon)
        return jnp.sum(val & hit.astype(jnp.uint32))

    @jax.jit
    def seeds_sort_votes(idx, rna, nmask):
        kms = _rolling_kmers(rna, k)
        kvalid = _window_valid(nmask, k)
        n = kms.shape[1]
        kmr_all = revcomp_packed(kms, k)
        flip_all = kmr_all < kms
        canon_all = jnp.where(flip_all, kmr_all, kms)
        mh = canon_all * jnp.uint32(MINIMIZER_HASH)
        mh = jnp.where(kvalid, mh, BIGK)
        picked = _minimizer_picks(mh, gi.minimizer_w) & kvalid
        sc = jnp.where(picked,
                       n - jnp.arange(n, dtype=jnp.int32)[None, :], 0)
        top_s, _ = jax.lax.top_k(sc, S)
        kv = top_s > 0
        off_s = jnp.where(kv, n - top_s, 0)
        canon = jnp.take_along_axis(canon_all, off_s, axis=1)
        flip = jnp.take_along_axis(flip_all, off_s, axis=1)
        off = off_s[:, :, None]
        hit, val = idx.kmer_table.lookup(canon)
        hit = hit & kv[:, :, None]
        pos_h = val & jnp.uint32(0xFFFFFFFE)
        sbit = (val & jnp.uint32(1)).astype(jnp.int32)
        strand_h = sbit ^ flip[:, :, None].astype(jnp.int32)
        offterm = jnp.where(strand_h == 0, off,
                            L - k - off).astype(jnp.uint32)
        ok = hit & (pos_h >= offterm)
        diag = pos_h - offterm
        key = (diag & jnp.uint32(0xFFFFFFFC)) | strand_h.astype(jnp.uint32)
        key = jnp.where(ok, key, BIGK)
        B = rna.shape[0]
        M = key.shape[1] * key.shape[2]
        flat = jnp.sort(key.reshape(B, M), axis=1)
        pos_i = jnp.arange(M, dtype=jnp.int32)[None, :]
        new_run = jnp.concatenate(
            [jnp.ones((B, 1), bool), flat[:, 1:] != flat[:, :-1]], axis=1)
        run_start = jax.lax.cummax(jnp.where(new_run, pos_i, 0), axis=1)
        run_end = -jax.lax.cummax(
            jnp.where(jnp.concatenate(
                [new_run[:, 1:], jnp.ones((B, 1), bool)], axis=1),
                -pos_i, -(M - 1)), axis=1, reverse=True)
        votes = jnp.where(new_run & (flat != BIGK),
                          run_end - run_start + 1, 0)
        top_votes, top_i = jax.lax.top_k(votes, MAX_CANDIDATES)
        return jnp.sum(top_votes) + jnp.sum(
            jnp.take_along_axis(flat, top_i, axis=1))

    results = {}
    aln_basic = make_aligner(didx, READ_LEN, bind=False,
                             sw_rescue=False, novel_sj=False)
    aln_full = make_aligner(didx, READ_LEN, bind=False)
    chem = get_chemistry("SC3Pv3")
    spacing = gi.genome_len // 2000
    genes, txs = [], []
    for g in range(2000):
        start = g * spacing + 1000
        strand = "+" if g % 2 == 0 else "-"
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", strand, g))
        txs.append(Transcript(f"T{g}", g, "chr1", strand,
                              [(start, start + 600),
                               (start + 1200, start + 2400)]))
    txome = Transcriptome(genes, txs)
    ann = AnnotationIndex.build(txome, gi)
    step = _make_step(didx, ann, chem, READ_LEN)

    from types import SimpleNamespace
    shim = SimpleNamespace(
        batch_size=BATCH,
        umi_packed=rng.integers(0, 1 << 24, BATCH).astype(np.uint32),
        slot_valid=np.ones(BATCH, bool), umi_valid=np.ones(BATCH, bool),
        rna=rna, rna_nmask=nmask, rna2=None, rna2_nmask=None)
    buf = jnp.asarray(pack_step_input(
        chem, READ_LEN, shim,
        rng.integers(0, 3_000_000, BATCH).astype(np.int32)))

    results["seeds_lookup"] = timeit(
        "seeds+minimizer+lookup", lambda: seeds_lookup(didx, rna_j, nmask_j))
    results["seeds_sort_votes"] = timeit(
        "  + vote sort + top_k", lambda: seeds_sort_votes(didx, rna_j, nmask_j))
    results["align_basic"] = timeit(
        "aligner (no rescue/SJ)", lambda: aln_basic(didx, rna_j, nmask_j)["pos"])
    results["align_full"] = timeit(
        "aligner full", lambda: aln_full(didx, rna_j, nmask_j)["pos"])
    results["step_full"] = timeit(
        "full step (align+annotate+pack)", lambda: step(buf)["mvec"])

    import json
    br = dict(batch=BATCH,
              seeds_lookup_ms=round(results["seeds_lookup"] * 1e3, 2),
              vote_sort_ms=round((results["seeds_sort_votes"]
                                  - results["seeds_lookup"]) * 1e3, 2),
              extend_ms=round((results["align_basic"]
                               - results["seeds_sort_votes"]) * 1e3, 2),
              rescue_sj_ms=round((results["align_full"]
                                  - results["align_basic"]) * 1e3, 2),
              annotate_pack_ms=round((results["step_full"]
                                      - results["align_full"]) * 1e3, 2),
              step_ms=round(results["step_full"] * 1e3, 2),
              S=S, H=H, M=S * H)
    print(json.dumps(br))


if __name__ == "__main__":
    main()
