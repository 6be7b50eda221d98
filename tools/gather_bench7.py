"""Ground-truth timing with forced host transfer per iteration."""
import sys, os, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.gather_bench3 import READ_LEN, BATCH, GENOME_LEN


def main():
    from cellranger_tpu.align.aligner import (
        DeviceIndex, SEED_STRIDE, MAX_HITS_PER_SEED, _rolling_kmers)
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    genome = bases[genome_codes].tobytes()
    genes = [Gene("G0", "G0", "chr1", "+", 0)]
    txs = [Transcript("T0", 0, "chr1", "+", [(1000, 3000)])]
    gi = GenomeIndex.build({"chr1": genome}, Transcriptome(genes, txs))
    didx = DeviceIndex.from_host(gi)

    k, L, H = didx.k, READ_LEN, MAX_HITS_PER_SEED
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
    rna = jnp.asarray(np.stack([genome_codes[s:s + READ_LEN] for s in starts]))
    nmask = jnp.ones((BATCH, READ_LEN), bool)

    @jax.jit
    def seeds_only(idx, codes, basemask):
        both = jnp.concatenate([codes, (3 - codes[:, ::-1]).astype(jnp.uint8)], 0)
        kms = _rolling_kmers(both, k)
        km = kms[:, seed_offsets]
        probe_hit, hit_pos = idx.kmer_hash.lookup(km, probe=H)
        return probe_hit.sum(), hit_pos.sum()

    # warmup/compile
    r = seeds_only(didx, rna, nmask)
    print("warm result:", np.asarray(r[0]), np.asarray(r[1]))
    for i in range(6):
        t0 = time.time()
        r = seeds_only(didx, rna, nmask)
        v = (np.asarray(r[0]), np.asarray(r[1]))  # force full sync
        print(f"iter {i}: {1000*(time.time()-t0):8.2f} ms")
main()
