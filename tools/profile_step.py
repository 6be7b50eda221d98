"""Stage-by-stage timing of the fused count step on the live device.

Times each jitted sub-stage separately (same shapes as bench.py) so we can
see where the 218ms/32k-read step goes. Not a test; a perf tool.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

READ_LEN = 91
BATCH = 32768
GENOME_LEN = 20_000_000
N_WL = 100_000


def timeit(name, fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cellranger_tpu.align.aligner import (
        DeviceIndex, make_aligner, SEED_STRIDE, MAX_HITS_PER_SEED,
        MAX_CANDIDATES, _rolling_kmers, _window_valid)
    from cellranger_tpu.align.annotate import AnnotationIndex, make_annotator
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.ops import barcode as bcops
    from cellranger_tpu.ops.hash_index import HashTable
    from cellranger_tpu.pipeline.count import _make_step

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    genome = bases[genome_codes].tobytes()
    genes, txs = [], []
    spacing = GENOME_LEN // 2000
    for g in range(2000):
        start = g * spacing + 1000
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", "+" if g % 2 == 0 else "-", g))
        txs.append(Transcript(f"T{g}", g, "chr1", "+" if g % 2 == 0 else "-",
                              [(start, start + 600), (start + 1200, start + 2400)]))
    txome = Transcriptome(genes, txs)
    gi = GenomeIndex.build({"chr1": genome}, txome)
    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")
    wl_arr = np.unique(rng.integers(0, 2**32, N_WL, dtype=np.uint64).astype(np.uint32))
    wl = Whitelist(np.sort(wl_arr), 16, "bench")
    wl_table = HashTable.build_exact(wl.sorted_seqs,
                                     np.arange(wl.size, dtype=np.uint32))
    wl_counts = jnp.zeros((wl.size,), jnp.int32)

    # synthetic reads drawn from the genome
    starts = rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
    rna = np.stack([genome_codes[s:s + READ_LEN] for s in starts])
    rna = jnp.asarray(rna.astype(np.uint8))
    nmask = jnp.ones((BATCH, READ_LEN), bool)
    bc_packed = jnp.asarray(rng.integers(0, 2**32, BATCH, dtype=np.uint64)
                            .astype(np.uint32))
    bc_qual = jnp.full((BATCH, 16), 70, jnp.uint8)
    umi_packed = jnp.asarray(rng.integers(0, 2**24, BATCH, dtype=np.uint64)
                             .astype(np.uint32))
    umi_valid = jnp.ones((BATCH,), bool)
    slot_valid = jnp.ones((BATCH,), bool)
    bc_exact = jnp.zeros((BATCH,), bool)

    print(f"device={jax.devices()[0].device_kind} batch={BATCH}")

    # full fused step
    step = _make_step(didx, ann, wl.size, chem, READ_LEN)
    timeit("FULL fused step", step, bc_packed, bc_qual, bc_exact,
           umi_packed, umi_valid, rna, nmask, slot_valid, wl_table, wl_counts)

    # barcode correction alone
    corr = jax.jit(lambda p, q, t, c: bcops.correct_barcodes(p, q, t, c, 16))
    timeit("barcode correct (48 cands)", corr, bc_packed, bc_qual,
           wl_table, wl_counts)

    # whitelist membership alone
    member = jax.jit(lambda p, t: bcops.whitelist_lookup(p, t))
    timeit("whitelist membership", member, bc_packed, wl_table)

    # full aligner (with SW rescue)
    alignf = make_aligner(didx, READ_LEN, bind=False)
    timeit("align full (sw_rescue)", lambda r, m: alignf(didx, r, m), rna, nmask)

    # aligner without SW
    align_nosw = make_aligner(didx, READ_LEN, sw_rescue=False, bind=False)
    timeit("align no-SW", lambda r, m: align_nosw(didx, r, m), rna, nmask)

    # --- align sub-stages (re-created inline, same shapes) ---
    k = didx.k
    L = READ_LEN
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    S = len(seed_offsets)
    H = MAX_HITS_PER_SEED

    @jax.jit
    def seeds_only(idx, codes, basemask):
        both = jnp.concatenate([codes, (3 - codes[:, ::-1]).astype(jnp.uint8)], 0)
        bmask = jnp.concatenate([basemask, basemask[:, ::-1]], 0)
        kms = _rolling_kmers(both, k)
        km = kms[:, seed_offsets]
        probe_hit, hit_pos = idx.kmer_hash.lookup(km, probe=H)
        return probe_hit.sum(), hit_pos.sum()

    timeit("  seed lookup (hash gather)", lambda r, m: seeds_only(didx, r, m),
           rna, nmask)

    @jax.jit
    def seeds_sort(idx, codes, basemask):
        both = jnp.concatenate([codes, (3 - codes[:, ::-1]).astype(jnp.uint8)], 0)
        bmask = jnp.concatenate([basemask, basemask[:, ::-1]], 0)
        kms = _rolling_kmers(both, k)
        kv = _window_valid(bmask, k)[:, seed_offsets]
        km = kms[:, seed_offsets]
        probe_hit, hit_pos = idx.kmer_hash.lookup(km, probe=H)
        hit_ok = probe_hit & kv[:, :, None]
        diag = hit_pos.astype(jnp.int32) - seed_offsets[None, :, None]
        diag = jnp.where(hit_ok & (diag >= 0), diag, jnp.int32(2**31 - 1))
        B2 = diag.shape[0]
        flat = jnp.sort(diag.reshape(B2, S * H), axis=1)
        return flat.sum()

    timeit("  seeds + sort", lambda r, m: seeds_sort(didx, r, m), rna, nmask)

    # extension window gather alone: D candidates per strand-read
    D = MAX_CANDIDATES
    cand_pos = jnp.asarray(
        rng.integers(0, GENOME_LEN - 200, (2 * BATCH, D)).astype(np.int32))
    NW = int(didx.text_words.shape[0])

    @jax.jit
    def window_gather(idx, pos):
        n_words = (L + 15) // 16 + 1
        w0 = pos >> 4
        widx = jnp.clip(w0[..., None] + jnp.arange(n_words), 0, NW - 1)
        both = idx.text_words[widx]
        return both.sum()

    timeit("  window gather [2B,D]", lambda p: window_gather(didx, p), cand_pos)

    # Kadane scoring alone
    win = jnp.asarray(rng.integers(0, 4, (2 * BATCH, D, L)).astype(np.uint8))

    @jax.jit
    def kadane(win, codes, basemask):
        both = jnp.concatenate([codes, (3 - codes[:, ::-1]).astype(jnp.uint8)], 0)
        bmask = jnp.concatenate([basemask, basemask[:, ::-1]], 0)
        m = (win == both[:, None, :]) & bmask[:, None, :]
        contrib = jnp.where(bmask[:, None, :], jnp.where(m, 1, -1), 0).astype(jnp.int32)
        cs = jnp.cumsum(contrib, axis=2)
        pref = jnp.pad(cs, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        run_min = jax.lax.cummax(-pref, axis=2)
        best_at = cs + run_min
        score = jnp.max(best_at, axis=2)
        end_i = jnp.argmax(best_at, axis=2)
        return score.sum() + end_i.sum()

    timeit("  kadane scoring [2B,D,L]", kadane, win, rna, nmask)

    # SW kernel alone
    from cellranger_tpu.align.sw import banded_sw, BAND
    win_sw = jnp.asarray(rng.integers(0, 4, (BATCH, L + BAND)).astype(np.uint8))
    wok = jnp.ones((BATCH, L + BAND), bool)
    timeit("  banded SW pallas [B]", lambda: banded_sw(rna, nmask, win_sw, wok))

    # annotate alone
    annotate = make_annotator(ann, didx.genome_len, didx.sj_overhang,
                              chem.strandedness, bind=False)
    pos = jnp.asarray(rng.integers(0, GENOME_LEN, 2 * BATCH).astype(np.int32))
    alen = jnp.full((2 * BATCH,), 80, jnp.int32)
    strand = jnp.zeros((2 * BATCH,), jnp.int32)
    mapq = jnp.full((2 * BATCH,), 255, jnp.int32)
    mapped = jnp.ones((2 * BATCH,), bool)
    timeit("annotate [2B]", lambda: annotate(ann, pos, alen, strand, mapq, mapped))


if __name__ == "__main__":
    main()
