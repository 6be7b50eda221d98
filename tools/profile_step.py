"""Stage-by-stage timing of the fused count step on the live device.

Times each jitted sub-stage separately (same shapes as bench.py). Sync via
np.asarray readback — block_until_ready alone can return early on tunneled
backends. Not a test; a perf tool.
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
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)

    sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms")


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cellranger_tpu.align.aligner import (
        DeviceIndex, make_aligner, SEED_STRIDE, MAX_HITS_PER_SEED,
        MAX_CANDIDATES, _rolling_kmers, make_window_fetch)
    from cellranger_tpu.align.annotate import AnnotationIndex, make_annotator
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.ops import barcode as bcops
    from cellranger_tpu.ops.bucket_table import BucketTable
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
    wl_table = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3).with_counts(np.ones(wl.size, np.int64))

    # synthetic reads drawn from the genome (2 errors each)
    pos = rng.integers(0, GENOME_LEN - READ_LEN - 1, BATCH)
    rna_np = genome_codes[pos[:, None] + np.arange(READ_LEN)[None, :]].copy()
    err_pos = rng.integers(0, READ_LEN, (BATCH, 2))
    for j in range(2):
        rna_np[np.arange(BATCH), err_pos[:, j]] ^= 1
    rna = jnp.asarray(rna_np)
    nmask = jnp.ones((BATCH, READ_LEN), bool)
    bc_idx = rng.integers(0, wl.size, BATCH)
    bcs = wl.sorted_seqs[bc_idx].copy()
    n_err = BATCH // 10
    bcs[:n_err] ^= (rng.integers(1, 4, n_err).astype(np.uint32)
                    << (2 * rng.integers(0, 16, n_err)).astype(np.uint32))
    bc_packed = jnp.asarray(bcs)
    bc_qual = jnp.full((BATCH, 16), 70, jnp.uint8)
    umi_packed = jnp.asarray(rng.integers(0, 2**24, BATCH, dtype=np.uint64)
                             .astype(np.uint32))
    ones = jnp.ones((BATCH,), bool)

    print(f"device={jax.devices()[0].device_kind} batch={BATCH}")

    step = _make_step(didx, ann, wl.size, chem, READ_LEN)
    timeit("FULL fused step", step, bc_packed, bc_qual, jnp.zeros((BATCH,), bool),
           umi_packed, ones, rna, nmask, ones, wl_table)

    member = jax.jit(lambda t, p: t.membership3(p))
    timeit("whitelist membership [B]", member, wl_table, bc_packed)

    C = BATCH // 2
    corr = jax.jit(lambda p, q, t: bcops.correct_barcodes(p, q, t, 16))
    timeit(f"barcode correct 48-cand [{C}]", corr, bc_packed[:C],
           bc_qual[:C], wl_table)

    alignf = make_aligner(didx, READ_LEN, bind=False)
    timeit("align full (sw_rescue)", lambda r, m: alignf(didx, r, m), rna, nmask)
    align_nosw = make_aligner(didx, READ_LEN, sw_rescue=False, bind=False)
    timeit("align no-SW", lambda r, m: align_nosw(didx, r, m), rna, nmask)

    # --- align sub-stages ---
    k = didx.k
    L = READ_LEN
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    S = len(seed_offsets)
    H = MAX_HITS_PER_SEED
    from cellranger_tpu.ops.encode import revcomp_packed

    @jax.jit
    def seeds_only(idx, codes):
        kms = _rolling_kmers(codes, k)
        km = kms[:, seed_offsets]
        kmr = revcomp_packed(km, k)
        canon = jnp.where(kmr < km, kmr, km)
        hit, val = idx.kmer_table.lookup(canon)
        return hit.sum(), val.sum()

    timeit("  canonical seed lookup [B,S]", lambda r: seeds_only(didx, r), rna)

    @jax.jit
    def seeds_sort(idx, codes):
        kms = _rolling_kmers(codes, k)
        km = kms[:, seed_offsets]
        kmr = revcomp_packed(km, k)
        canon = jnp.where(kmr < km, kmr, km)
        hit, val = idx.kmer_table.lookup(canon)
        key = (val & jnp.uint32(0x7FFFFFFF))
        key = jnp.where(hit, key, jnp.uint32(0xFFFFFFFF))
        B = key.shape[0]
        return jnp.sort(key.reshape(B, -1), axis=1).sum()

    timeit("  seeds + sort [B,S*H]", lambda r: seeds_sort(didx, r), rna)

    D = MAX_CANDIDATES
    cand_pos = jnp.asarray(
        rng.integers(0, GENOME_LEN - 200, (BATCH, D)).astype(np.int32))
    fetch = make_window_fetch(didx, L)

    @jax.jit
    def window_fetch_only(idx, pos):
        win, wok = fetch(idx, pos)
        return win.sum(), wok.sum()

    timeit("  window fetch+realign [B,D]", lambda p: window_fetch_only(didx, p),
           cand_pos)

    annotate = make_annotator(ann, didx.genome_len, didx.sj_overhang,
                              chem.strandedness, bind=False)
    posb = jnp.asarray(rng.integers(0, GENOME_LEN, BATCH).astype(np.int32))
    alen = jnp.full((BATCH,), 80, jnp.int32)
    zeros = jnp.zeros((BATCH,), jnp.int32)
    mapq = jnp.full((BATCH,), 255, jnp.int32)
    timeit("annotate [B]", lambda: annotate(ann, posb, alen, zeros, mapq, ones))


if __name__ == "__main__":
    main()
