"""Synthetic test-data generators: random genomes, transcriptomes with known
structure, and simulated reads with ground truth. The reference validates
against bundled real fixtures (cellranger_tiny_ref) which are not shipped in
the public tree; we generate equivalent miniature data with known truth."""

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng, length: int) -> bytes:
    return BASES[rng.integers(0, 4, length)].tobytes()


def mutate(rng, seq: bytes, n_subs: int) -> bytes:
    s = bytearray(seq)
    for _ in range(n_subs):
        p = int(rng.integers(len(s)))
        s[p] = int(BASES[int(rng.integers(4))])
    return bytes(s)


def revcomp(seq: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    return seq.translate(comp)[::-1]


def make_two_gene_gtf(path: str, chrom="chr1"):
    """Two genes on chr1: geneA (+, 2 exons with an intron), geneB (-, 1 exon).

    geneA: exon1 [1000,1400), intron [1400,2200), exon2 [2200,2600)
    geneB: exon  [5000,5800), strand -
    Coordinates in the file are 1-based inclusive GTF.
    """
    rows = [
        (chrom, "test", "exon", 1001, 1400, ".", "+", ".",
         'gene_id "GA"; transcript_id "TA"; gene_name "GeneA";'),
        (chrom, "test", "exon", 2201, 2600, ".", "+", ".",
         'gene_id "GA"; transcript_id "TA"; gene_name "GeneA";'),
        (chrom, "test", "exon", 5001, 5800, ".", "-", ".",
         'gene_id "GB"; transcript_id "TB"; gene_name "GeneB";'),
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r[:8]) + "\t" + r[8] + "\n")
