"""Secondary alignment records for multimapped reads (VERDICT r3 item 4).

The reference emits every extra alignment of a multimapped read as a
flagged secondary record (lib/rust/tx_annotation/src/read.rs:155,224-226),
demoting them to MAPQ 0 when one locus is promoted/rescued
(read.rs:152-156); its own comparator compares them
(lib/rust/cr_lib/src/testing/correctness.rs:256-259).
"""

import gzip
import os

import numpy as np
import pytest

from cellranger_tpu.io.bam_read import read_bam
from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.pipeline.count import CountConfig, run_count

READ_LEN = 91


@pytest.fixture(scope="module")
def multimapper_bam_run(tmp_path_factory):
    """Genome with two duplicated 400bp segments:

      * segment M at 2000 and 14000 — both intergenic: reads stay
        2-locus multimapped (MAPQ 3, no promotion);
      * segment P at 6000 (inside gene GP's exon) and 17000 (intergenic):
        reads are gene-promoted (primary MAPQ 255 + mm tag, secondary
        demoted to MAPQ 0, read.rs:152-156).
    """
    tmp = tmp_path_factory.mktemp("secondary")
    rng = np.random.default_rng(77)
    genome = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8), 24_000))
    seg_m = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 400))
    seg_p = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 400))
    genome[2000:2400] = seg_m
    genome[14000:14400] = seg_m
    genome[6000:6400] = seg_p
    genome[17000:17400] = seg_p
    genome = bytes(genome)
    write_fasta(str(tmp / "g.fa"), {"chr1": genome})
    with open(tmp / "g.gtf", "w") as f:
        # GP covers only the FIRST copy of segment P (promotion applies);
        # a filler gene far from every duplicated segment
        f.write('chr1\tt\texon\t5901\t6500\t.\t+\t.\t'
                'gene_id "GP"; transcript_id "TP"; gene_name "GeneP";\n')
        f.write('chr1\tt\texon\t9001\t9600\t.\t+\t.\t'
                'gene_id "GF"; transcript_id "TF"; gene_name "GeneF";\n')
    ReferencePackage.build(str(tmp / "g.fa"), str(tmp / "g.gtf"),
                           str(tmp / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(20)})
    open(tmp / "wl.txt", "w").writelines(s + "\n" for s in wl)
    r1p = str(tmp / "mm_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp / "mm_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(8):   # multimapped, never promoted
            umi = "".join(rng.choice(list("ACGT"), 12))
            off = int(rng.integers(0, 400 - READ_LEN))
            f1.write(f"@mm{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@mm{i}\n{seg_m[off:off + READ_LEN].decode()}\n"
                     f"+\n{'F' * READ_LEN}\n")
        for i in range(8):   # gene-promoted multimappers
            umi = "".join(rng.choice(list("ACGT"), 12))
            off = int(rng.integers(0, 400 - READ_LEN))
            f1.write(f"@pr{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@pr{i}\n{seg_p[off:off + READ_LEN].decode()}\n"
                     f"+\n{'F' * READ_LEN}\n")
        for i in range(8):   # unique reads (no secondaries at all)
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(9000, 9600 - READ_LEN))
            f1.write(f"@uq{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@uq{i}\n{genome[p:p + READ_LEN].decode()}\n"
                     f"+\n{'F' * READ_LEN}\n")
    out = str(tmp / "out")
    run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp / "ref"),
        whitelist_path=str(tmp / "wl.txt"), chemistry="SC3Pv3",
        read_len=READ_LEN, batch_size=64, secondary_analysis=False,
        checkpoint=False, write_bam=True), out)
    _, records, _ = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    by_name: dict = {}
    for r in records:
        by_name.setdefault(r["name"], []).append(r)
    return by_name


def test_two_locus_read_has_primary_and_secondary(multimapper_bam_run):
    by_name = multimapper_bam_run
    seen = 0
    for name, recs in by_name.items():
        if not name.startswith("mm"):
            continue
        prim = [r for r in recs if not r["flag"] & 0x100]
        sec = [r for r in recs if r["flag"] & 0x100]
        assert len(prim) == 1, name
        if not prim[0]["flag"] & 0x4:
            assert len(sec) == 1, name
            assert prim[0]["mapq"] == 3          # STAR 2-locus MAPQ
            assert sec[0]["mapq"] == 3
            assert prim[0]["pos"] != sec[0]["pos"]
            assert {prim[0]["pos"], sec[0]["pos"]} <= {
                2000 + (prim[0]["pos"] - 2000) % 12000,
                14000 + (prim[0]["pos"] - 2000) % 12000}
            seen += 1
    assert seen >= 6


def test_promoted_read_secondary_demoted_to_mapq0(multimapper_bam_run):
    by_name = multimapper_bam_run
    seen = 0
    for name, recs in by_name.items():
        if not name.startswith("pr"):
            continue
        prim = [r for r in recs if not r["flag"] & 0x100]
        sec = [r for r in recs if r["flag"] & 0x100]
        assert len(prim) == 1, name
        if prim[0]["mapq"] == 255:   # promoted (mm tag, read.rs:152-156)
            assert prim[0]["tags"].get("mm") == 1
            assert prim[0]["tags"].get("GX") == "GP"
            assert len(sec) == 1, name
            assert sec[0]["mapq"] == 0
            seen += 1
    assert seen >= 6


def test_secondary_records_carry_no_cb_ub_or_annotation(multimapper_bam_run):
    by_name = multimapper_bam_run
    n_sec = 0
    for recs in by_name.values():
        for r in recs:
            if not r["flag"] & 0x100:
                continue
            n_sec += 1
            for t in ("CB", "UB", "GX", "GN", "TX", "AN", "RE", "mm"):
                assert t not in r["tags"], (r["name"], t)
            for t in ("CR", "CY", "UR", "UY"):
                assert t in r["tags"], (r["name"], t)
            assert r["tags"]["xf"] == 0
    assert n_sec >= 12


def test_unique_reads_have_no_secondary(multimapper_bam_run):
    by_name = multimapper_bam_run
    for name, recs in by_name.items():
        if name.startswith("uq"):
            assert len(recs) == 1, name
            assert not recs[0]["flag"] & 0x100
