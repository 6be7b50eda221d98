"""Deterministic synthetic run fixtures — the cellranger_tiny_fastq /
cellranger_tiny_ref analog (third-party/cellranger_tiny_ref.BUILD).

The reference ships a tiny but complete dataset that `cellranger testrun`
drives end-to-end (cr_wrap/src/bin/cellranger.rs:579-639); our equivalent
is generated: a seeded RNG builds a spliced 2-gene reference package,
whitelist, and gzipped FASTQs with known per-cell ground truth (cells x
molecules x duplicate reads, barcode errors, N-base junk reads).  The same
seed always produces byte-identical inputs, so golden snapshots of the
outputs gate regressions (tests/test_conformance.py).
"""

from __future__ import annotations

import gzip
import os

import numpy as np

READ_LEN = 91

EXONS = {
    "G1": [(10_000, 12_000), (15_000, 17_000)],   # spliced, + strand
    "G2": [(60_000, 64_000)],                      # single exon, - strand
}
STRANDS = {"G1": "+", "G2": "-"}


def build_synthetic_run(tmp: str, seed: int = 11, genome_len: int = 120_000,
                        n_wl: int = 2000, n_cells: int = 40,
                        mols_per_cell: int = 25, dup_reads: int = 2,
                        read_len: int = READ_LEN) -> dict:
    """Build reference package + whitelist + FASTQs under `tmp`.

    Returns dict(ref, wl, fq1, fq2, truth [2 x n_cells molecule counts],
    cells [whitelist indices], wl_seqs, n_reads).
    """
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, genome_len).astype(np.uint8)
    genome = bases[genome_codes].tobytes().decode()

    os.makedirs(tmp, exist_ok=True)
    fasta = os.path.join(tmp, "genome.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        for i in range(0, genome_len, 80):
            f.write(genome[i:i + 80] + "\n")
    gtf = os.path.join(tmp, "genes.gtf")
    with open(gtf, "w") as f:
        for gname, exs in EXONS.items():
            s = STRANDS[gname]
            lo, hi = exs[0][0] + 1, exs[-1][1]
            attr = (f'gene_id "{gname}"; gene_name "{gname}"; '
                    f'transcript_id "T_{gname}";')
            f.write(f"chr1\tsyn\tgene\t{lo}\t{hi}\t.\t{s}\t.\t{attr}\n")
            f.write(f"chr1\tsyn\ttranscript\t{lo}\t{hi}\t.\t{s}\t.\t{attr}\n")
            for (a, b) in exs:
                f.write(f"chr1\tsyn\texon\t{a + 1}\t{b}\t.\t{s}\t.\t{attr}\n")

    from ..io.reference import ReferencePackage
    ref_dir = os.path.join(tmp, "ref")
    ReferencePackage.build(fasta, gtf, ref_dir, genome_name="synth")

    wl_seqs = sorted({"".join(rng.choice(list("ACGT"), 16))
                      for _ in range(n_wl + 200)})[:n_wl]
    wl_path = os.path.join(tmp, "whitelist.txt")
    with open(wl_path, "w") as f:
        f.write("\n".join(wl_seqs) + "\n")

    cells = rng.choice(n_wl, n_cells, replace=False)
    r1s, r2s = [], []
    truth = np.zeros((2, n_cells), np.int64)  # gene x cell molecules

    def tx_seq(gname):
        s = "".join(genome[a:b] for (a, b) in EXONS[gname])
        if STRANDS[gname] == "-":
            comp = str.maketrans("ACGT", "TGCA")
            s = s.translate(comp)[::-1]
        return s

    txs = {g: tx_seq(g) for g in EXONS}
    seen_umi = set()
    for ci, c in enumerate(cells):
        bc = wl_seqs[c]
        for m in range(mols_per_cell):
            gname = "G1" if (ci + m) % 2 == 0 else "G2"
            gi_ = 0 if gname == "G1" else 1
            while True:
                umi = "".join(rng.choice(list("ACGT"), 12))
                if (c, gi_, umi) not in seen_umi:
                    seen_umi.add((c, gi_, umi))
                    break
            t = txs[gname]
            # 3' assay: cDNA read sense = transcript sense for SC3Pv3 R2
            start = int(rng.integers(0, len(t) - read_len))
            cdna = t[start:start + read_len]
            truth[gi_, ci] += 1
            for d in range(dup_reads):
                # sprinkle: a barcode error on some duplicate reads
                bc_obs = bc
                if d == 1 and m % 5 == 0:
                    p = int(rng.integers(16))
                    alt = "ACGT"[(("ACGT".index(bc[p])) + 1) % 4]
                    bc_obs = bc[:p] + alt + bc[p + 1:]
                r1s.append(bc_obs + umi)
                r2s.append(cdna)
    # junk reads: N bases, garbage barcodes
    for _ in range(50):
        r1s.append("N" * 16 + "A" * 12)
        r2s.append("".join(rng.choice(list("ACGT"), read_len)))

    order = rng.permutation(len(r1s))
    fq1 = os.path.join(tmp, "sample_S1_L001_R1_001.fastq.gz")
    fq2 = os.path.join(tmp, "sample_S1_L001_R2_001.fastq.gz")
    # fixed mtime so the gzip payload is byte-stable across rebuilds
    with open(fq1, "wb") as h1, gzip.GzipFile(fileobj=h1, mode="wb",
                                              mtime=0) as f1, \
            open(fq2, "wb") as h2, gzip.GzipFile(fileobj=h2, mode="wb",
                                                 mtime=0) as f2:
        for i, oi in enumerate(order):
            f1.write(f"@read{i}\n{r1s[oi]}\n+\n{'I' * len(r1s[oi])}\n"
                     .encode())
            f2.write(f"@read{i}\n{r2s[oi]}\n+\n{'I' * len(r2s[oi])}\n"
                     .encode())

    return dict(ref=ref_dir, wl=wl_path, fq1=fq1, fq2=fq2, truth=truth,
                cells=cells, wl_seqs=wl_seqs, n_reads=len(r1s))
