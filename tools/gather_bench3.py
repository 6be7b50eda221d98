"""Bisect the seeds_only 37ms: which op inside is slow with the REAL index?"""
import sys, os, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

READ_LEN = 91
BATCH = 32768
GENOME_LEN = 20_000_000


def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.time()-t0)/iters*1000:8.3f} ms")


def main():
    from cellranger_tpu.align.aligner import (
        DeviceIndex, SEED_STRIDE, MAX_HITS_PER_SEED, _rolling_kmers)
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    genome = bases[genome_codes].tobytes()
    genes, txs = [], []
    spacing = GENOME_LEN // 2000
    for g in range(2000):
        start = g * spacing + 1000
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", "+", g))
        txs.append(Transcript(f"T{g}", g, "chr1", "+",
                              [(start, start + 600), (start + 1200, start + 2400)]))
    txome = Transcriptome(genes, txs)
    gi = GenomeIndex.build({"chr1": genome}, txome)
    didx = DeviceIndex.from_host(gi)
    print(f"kmer_hash: slots=2^{didx.kmer_hash.bits}")

    k = didx.k
    L = READ_LEN
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
    rna = jnp.asarray(np.stack([genome_codes[s:s + READ_LEN] for s in starts]))
    H = MAX_HITS_PER_SEED

    @jax.jit
    def strands(codes):
        rc = (3 - codes[:, ::-1]).astype(jnp.uint8)
        return jnp.concatenate([codes, rc], 0)

    timeit("strands concat", strands, rna)
    both = jax.block_until_ready(strands(rna))

    @jax.jit
    def kmers(both):
        kms = _rolling_kmers(both, k)
        return kms[:, seed_offsets]

    timeit("rolling kmers + slice", kmers, both)
    km = jax.block_until_ready(kmers(both))

    @jax.jit
    def lk(idx, km):
        return idx.kmer_hash.lookup(km, probe=H)

    timeit(f"hash lookup [2B,{len(seed_offsets)}] probe={H}", lk, didx, km)

    # random queries instead of genome-derived kmers
    qrand = jnp.asarray(rng.integers(0, 2**32, km.shape, np.uint64).astype(np.uint32))
    timeit("hash lookup same-shape RANDOM queries", lk, didx, qrand)

    # full seeds_only chain fused in one jit
    @jax.jit
    def chain(idx, codes):
        rc = (3 - codes[:, ::-1]).astype(jnp.uint8)
        both = jnp.concatenate([codes, rc], 0)
        kms = _rolling_kmers(both, k)
        km = kms[:, seed_offsets]
        return idx.kmer_hash.lookup(km, probe=H)

    timeit("fused chain (strands+kmers+lookup)", chain, didx, rna)


def main2():
    """Replicate profile_step's environment incrementally to find what makes
    the identical chain 600x slower there."""
    from cellranger_tpu.align.aligner import (
        DeviceIndex, SEED_STRIDE, MAX_HITS_PER_SEED, _rolling_kmers, _window_valid)
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.io.whitelist import Whitelist
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

    k, L, H = didx.k, READ_LEN, MAX_HITS_PER_SEED
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
    rna = jnp.asarray(np.stack([genome_codes[s:s + READ_LEN] for s in starts]))
    nmask = jnp.ones((BATCH, READ_LEN), bool)

    @jax.jit
    def seeds_only(idx, codes, basemask):
        both = jnp.concatenate([codes, (3 - codes[:, ::-1]).astype(jnp.uint8)], 0)
        bmask = jnp.concatenate([basemask, basemask[:, ::-1]], 0)
        kms = _rolling_kmers(both, k)
        km = kms[:, seed_offsets]
        probe_hit, hit_pos = idx.kmer_hash.lookup(km, probe=H)
        return probe_hit.sum(), hit_pos.sum()

    timeit("seeds_only BEFORE building step", lambda r, m: seeds_only(didx, r, m),
           rna, nmask)

    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")
    wl_arr = np.unique(rng.integers(0, 2**32, 100_000, dtype=np.uint64).astype(np.uint32))
    wl = Whitelist(np.sort(wl_arr), 16, "bench")
    wl_table = HashTable.build_exact(wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32))
    wl_counts = jnp.zeros((wl.size,), jnp.int32)
    step = _make_step(didx, ann, wl.size, chem, READ_LEN)
    bc_packed = jnp.asarray(rng.integers(0, 2**32, BATCH, dtype=np.uint64).astype(np.uint32))
    bc_qual = jnp.full((BATCH, 16), 70, jnp.uint8)
    umi_packed = jnp.asarray(rng.integers(0, 2**24, BATCH, dtype=np.uint64).astype(np.uint32))
    ones = jnp.ones((BATCH,), bool)
    out = step(bc_packed, bc_qual, jnp.zeros((BATCH,), bool), umi_packed,
               ones, rna, nmask, ones, wl_table, wl_counts)
    jax.block_until_ready(out)
    print("full step ran once")

    timeit("seeds_only AFTER step ran", lambda r, m: seeds_only(didx, r, m),
           rna, nmask)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "2":
        main2()
    else:
        main()
