"""Novel splice junction discovery (unannotated introns).

The reference gets novel junctions from STAR's split-read search
(align_and_count.rs drives STAR in-process); our aligner re-derives them
from candidate-pair split scoring over the already-computed diagonal
prefix sums, with canonical GT..AG / CT..AC motif shifting.
"""

import numpy as np
import pytest

from cellranger_tpu.align.index import GenomeIndex
from cellranger_tpu.align.aligner import DeviceIndex, make_aligner

from util import random_genome, mutate, revcomp
from test_aligner import codes_batch

READ_LEN = 91


@pytest.fixture(scope="module")
def sj_setup():
    rng = np.random.default_rng(17)
    g = bytearray(random_genome(rng, 150_000))
    # plant canonical junctions: donor GT at d, acceptor AG at a-2
    junctions = []
    for d in range(20_000, 120_000, 10_000):
        intron = int(rng.integers(200, 5_000))
        a = d + intron
        g[d:d + 2] = b"GT"
        g[a - 2:a] = b"AG"
        junctions.append((d, a))
    genome = bytes(g)
    gi = GenomeIndex.build({"chr1": genome}, None)
    return genome, junctions, DeviceIndex.from_host(gi)


def make_spliced_read(genome, d, a, left_len, rc=False):
    read = genome[d - left_len:d] + genome[a:a + (READ_LEN - left_len)]
    return revcomp(read) if rc else read


def test_novel_junction_detection(sj_setup):
    genome, junctions, didx = sj_setup
    align = make_aligner(didx, READ_LEN)
    rng = np.random.default_rng(23)
    reads, truth = [], []
    for (d, a) in junctions:
        for _ in range(4):
            left = int(rng.integers(30, 62))
            rc = bool(rng.integers(2))
            reads.append(make_spliced_read(genome, d, a, left, rc))
            truth.append((d, a, rc))
    codes, mask = codes_batch(reads, READ_LEN)
    out = align(codes, mask)
    novel = np.asarray(out["novel_sj"])
    donor = np.asarray(out["sj_donor"]).astype(np.int64)
    acc = np.asarray(out["sj_acceptor"]).astype(np.int64)
    mapped = np.asarray(out["mapped"])
    td = np.asarray([t[0] for t in truth])
    ta = np.asarray([t[1] for t in truth])
    exact = novel & mapped & (donor == td) & (acc == ta)
    frac = exact.mean()
    assert frac > 0.9, f"only {frac:.2%} junctions recovered exactly"
    # spliced winners are unique loci at full-read scores
    assert (np.asarray(out["mapq"])[exact] == 255).mean() > 0.95
    assert (np.asarray(out["score"])[exact] >= READ_LEN - 2).all()


def test_novel_junction_with_mismatches(sj_setup):
    genome, junctions, didx = sj_setup
    align = make_aligner(didx, READ_LEN)
    rng = np.random.default_rng(29)
    d, a = junctions[3]
    reads = [mutate(rng, make_spliced_read(genome, d, a, 45), 2)
             for _ in range(32)]
    codes, mask = codes_batch(reads, READ_LEN)
    out = align(codes, mask)
    good = (np.asarray(out["novel_sj"])
            & (np.asarray(out["sj_donor"]).astype(np.int64) == d)
            & (np.asarray(out["sj_acceptor"]).astype(np.int64) == a))
    assert good.mean() > 0.8


def test_no_false_splices(sj_setup):
    genome, _, didx = sj_setup
    align = make_aligner(didx, READ_LEN)
    rng = np.random.default_rng(31)
    reads = []
    for _ in range(256):
        p = int(rng.integers(0, len(genome) - READ_LEN))
        reads.append(mutate(rng, genome[p:p + READ_LEN], 3))
    codes, mask = codes_batch(reads, READ_LEN)
    out = align(codes, mask)
    fp = (np.asarray(out["novel_sj"]) & np.asarray(out["mapped"])).mean()
    assert fp < 0.02, f"false splice rate {fp:.2%}"


def test_short_gap_is_not_a_junction(sj_setup):
    # a 10-base gap is a deletion (SJ_MIN_INTRON=21): SW rescue territory,
    # never a novel junction call
    genome, _, didx = sj_setup
    align = make_aligner(didx, READ_LEN)
    p = 40_000
    read = genome[p:p + 45] + genome[p + 55:p + 55 + (READ_LEN - 45)]
    codes, mask = codes_batch([read], READ_LEN)
    out = align(codes, mask)
    assert not bool(out["novel_sj"][0])


def test_novel_sj_count_pipeline(tmp_path):
    """End-to-end: novel junction reads count to the gene, junctions.tsv
    records the discovered intron, BAM carries the N CIGAR."""
    import gzip
    import os
    from cellranger_tpu.io.gtf import write_fasta
    from cellranger_tpu.io.reference import ReferencePackage
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    from bam_reader import read_bam

    rng = np.random.default_rng(41)
    g = bytearray(random_genome(rng, 12_000))
    d, a = 1800, 2600                       # unannotated intron [1800, 2600)
    g[d:d + 2] = b"GT"
    g[a - 2:a] = b"AG"
    genome = bytes(g)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        # one exon spanning the whole locus; the junction is NOT annotated
        f.write('chr1\tt\texon\t501\t4000\t.\t+\t.\t'
                'gene_id "GN"; transcript_id "TN"; gene_name "GN";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    n_sj_reads = 0
    with gzip.open(tmp_path / "n_S1_L001_R1_001.fastq.gz", "wt") as f1, \
         gzip.open(tmp_path / "n_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for i in range(60):
            umi = "".join(rng.choice(list("ACGT"), 12))
            if i % 2 == 0:                  # spliced over the novel junction
                left = int(rng.integers(30, 60))
                cdna = (genome[d - left:d]
                        + genome[a:a + READ_LEN - left]).decode()
                n_sj_reads += 1
            else:                           # plain exonic
                p = int(rng.integers(600, 1500 - READ_LEN))
                cdna = genome[p:p + READ_LEN].decode()
            f1.write(f"@r{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@r{i}\n{cdna}\n+\n{'F' * len(cdna)}\n")

    out = str(tmp_path / "out")
    cfg = CountConfig(
        fastq_pairs=[(str(tmp_path / "n_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "n_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv3",
        read_len=READ_LEN, batch_size=1024, write_bam=True,
        secondary_analysis=False)
    summary = run_count(cfg, out)
    assert summary["conf_mapped_frac"] > 0.95

    with open(os.path.join(out, "junctions.tsv")) as f:
        lines = [l.rstrip("\n").split("\t") for l in f][1:]
    novel = [l for l in lines if l[5] == "0"]
    assert len(novel) == 1
    chrom, first, last, strand_c, motif, annot, reads = novel[0]
    assert (chrom, int(first), int(last)) == ("chr1", d + 1, a)
    assert strand_c == "+" and int(motif) == 1
    assert int(reads) == n_sj_reads

    _refs, recs, _txt = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    ncig = [r for r in recs if any(op == "N" for _, op in r["cigar"])]
    assert len(ncig) == n_sj_reads
    assert all((a - d, "N") in r["cigar"] for r in ncig)
