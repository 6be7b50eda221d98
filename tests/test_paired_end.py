"""Paired-end alignment (SC5P-PE): proper-pair gating + pair gene logic."""

import gzip

import numpy as np

from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.pipeline.count import CountConfig, run_count

READ_LEN = 91


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), n))


def _revcomp(s: bytes) -> bytes:
    return s.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


def _build_ref(tmp_path, rng):
    genome = _rand(rng, b"ACGT", 20_000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        # one + strand gene [2000, 6000); far-away region is intergenic
        f.write('chr1\tt\texon\t2001\t6000\t.\t+\t.\t'
                'gene_id "GP"; transcript_id "TP"; gene_name "GP";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    return genome


def _write_pe_run(tmp_path, genome, rng, wl, n_proper=20, n_discordant=6):
    """mate1 = sense cDNA at the gene's 5' end (R1 after bc+umi);
    mate2 = revcomp of a downstream fragment (R2).  Discordant pairs get a
    mate2 from 10kb away."""
    r1p = str(tmp_path / "p_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "p_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(n_proper + n_discordant):
            umi = "".join(rng.choice(list("ACGT"), 10))
            p1 = int(rng.integers(2000, 3000))
            mate1 = genome[p1:p1 + READ_LEN]
            if i < n_proper:
                p2 = p1 + int(rng.integers(150, 400))
            else:
                p2 = 12_000 + int(rng.integers(0, 2000))  # discordant
            mate2 = _revcomp(genome[p2:p2 + READ_LEN])
            r1 = wl[i % 4] + umi + mate1.decode()
            f1.write(f"@p{i}\n{r1}\n+\n{'F' * len(r1)}\n")
            f2.write(f"@p{i}\n{mate2.decode()}\n+\n{'F' * READ_LEN}\n")
    return r1p, r2p


def test_sc5p_pe_proper_pairs(tmp_path):
    rng = np.random.default_rng(71)
    genome = _build_ref(tmp_path, rng)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    r1p, r2p = _write_pe_run(tmp_path, genome, rng, wl)
    s = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC5P-PE",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False), str(tmp_path / "out"))
    # 20 proper pairs conf-map to GP; 6 discordant pairs are unmapped
    assert s["total_reads"] == 26
    assert s["conf_mapped_reads"] == 20
    assert s["improper_pair_reads"] == 6
    assert s["mapped_reads"] == 20
    assert s["total_molecules"] == 20


def test_sc5p_pe_pair_gene_intersection(tmp_path):
    """mate1 intergenic + mate2 genic: the pair gene set is the non-empty
    mate's (transcript.rs:27-33) -> the pair still counts to the gene."""
    rng = np.random.default_rng(72)
    genome = _build_ref(tmp_path, rng)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    r1p = str(tmp_path / "q_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "q_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(12):
            umi = "".join(rng.choice(list("ACGT"), 10))
            # mate1 starts in the intergenic run-up but within pair range
            p1 = 1850 + i  # read [1850, 1941): mostly before the gene
            mate1 = genome[p1:p1 + READ_LEN]
            p2 = p1 + 300
            mate2 = _revcomp(genome[p2:p2 + READ_LEN])
            r1 = wl[i % 3] + umi + mate1.decode()
            f1.write(f"@q{i}\n{r1}\n+\n{'F' * len(r1)}\n")
            f2.write(f"@q{i}\n{mate2.decode()}\n+\n{'F' * READ_LEN}\n")
    s = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC5P-PE",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False), str(tmp_path / "out"))
    assert s["mapped_reads"] == 12
    assert s["conf_mapped_reads"] == 12
    assert s["total_molecules"] == 12


def test_sc5p_pe_bam_both_mates(tmp_path):
    """PE write_bam emits BOTH mate records with paired FLAG bits, mate
    RNEXT/PNEXT, and symmetric TLEN (write_pos_bam.rs emits every mate)."""
    rng = np.random.default_rng(73)
    genome = _build_ref(tmp_path, rng)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    r1p, r2p = _write_pe_run(tmp_path, genome, rng, wl,
                             n_proper=15, n_discordant=5)
    s = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC5P-PE",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False, write_bam=True), str(tmp_path / "out"))
    assert s["conf_mapped_reads"] == 15
    from cellranger_tpu.io.bam_read import read_bam
    refs, records, _ = read_bam(str(tmp_path / "out" /
                                    "possorted_genome_bam.bam"))
    # two records per read pair, every record paired + one mate bit
    assert len(records) == 2 * 20
    by_name = {}
    for r in records:
        assert r["flag"] & 0x1
        assert bool(r["flag"] & 0x40) != bool(r["flag"] & 0x80)
        by_name.setdefault(r["name"], []).append(r)
    n_umi_count = 0
    for name, pair in by_name.items():
        assert len(pair) == 2
        m1 = next(r for r in pair if r["flag"] & 0x40)
        m2 = next(r for r in pair if r["flag"] & 0x80)
        if not (m1["flag"] & 0x4):   # proper pair: both mapped
            for a, b in ((m1, m2), (m2, m1)):
                assert a["flag"] & 0x2
                assert a["next_ref"] == b["ref_id"]
                assert a["next_pos"] == b["pos"]
            assert m1["tlen"] == -m2["tlen"] != 0
            # mate-reverse bit mirrors the other mate's reverse bit
            assert bool(m1["flag"] & 0x20) == bool(m2["flag"] & 0x10)
            assert bool(m2["flag"] & 0x20) == bool(m1["flag"] & 0x10)
            # conf pairs carry GX on both mates, UMI_COUNT on at most one
            if "GX" in m1["tags"]:
                assert m2["tags"].get("GX") == m1["tags"]["GX"]
            n_umi_count += sum(bool(r["tags"]["xf"] & 8) for r in pair)
        else:                        # improper: both unmapped, mate-unmapped
            assert m2["flag"] & 0x4
            assert m1["flag"] & 0x8 and m2["flag"] & 0x8
            assert not (m1["flag"] & 0x2)
    assert n_umi_count == s["total_molecules"] == 15
