"""Full BAM tag dialect: RG/TX/AN/mm, feature-barcode records with
fr/fq/fb/fx + CONF_FEATURE, R1 feature patterns."""

import gzip
import os

import numpy as np
import pytest

from cellranger_tpu.io.bam_read import read_bam
from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.pipeline.count import CountConfig, LibraryDef, run_count

READ_LEN = 91
AB_SEQS = ["ACGTACGTACGTACG", "TTTTGGGGCCCCAAA", "GACGACGACGACGAC"]


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), n))


@pytest.fixture(scope="module")
def dual_lib_bam_run(tmp_path_factory):
    """GEX + antibody run with write_bam: R2 pattern for 2 antibodies and
    an R1 pattern for the third."""
    tmp = tmp_path_factory.mktemp("dialect")
    rng = np.random.default_rng(95)
    genome = _rand(rng, b"ACGT", 12_000)
    write_fasta(str(tmp / "g.fa"), {"chr1": genome})
    with open(tmp / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t5000\t.\t+\t.\t'
                'gene_id "GD"; transcript_id "TD"; gene_name "GeneD";\n')
        f.write('chr1\tt\texon\t7001\t10000\t.\t-\t.\t'
                'gene_id "GE"; transcript_id "TE"; gene_name "GeneE";\n')
    ReferencePackage.build(str(tmp / "g.fa"), str(tmp / "g.gtf"),
                           str(tmp / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp / "wl.txt", "w").writelines(s + "\n" for s in wl)
    with open(tmp / "features.csv", "w") as f:
        f.write("id,name,read,pattern,sequence,feature_type\n")
        f.write(f"AB0,Ab0,R2,5P(BC),{AB_SEQS[0]},Antibody Capture\n")
        f.write(f"AB1,Ab1,R2,5P(BC),{AB_SEQS[1]},Antibody Capture\n")
        f.write(f"AB2,Ab2,R1,5P(BC),{AB_SEQS[2]},Antibody Capture\n")
    # GEX reads
    g1, g2 = str(tmp / "gex_S1_L001_R1_001.fastq.gz"), \
        str(tmp / "gex_S1_L001_R2_001.fastq.gz")
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    with gzip.open(g1, "wt") as f1, gzip.open(g2, "wt") as f2:
        for i in range(40):
            umi = "".join(rng.choice(list("ACGT"), 12))
            if i % 2 == 0:
                p = int(rng.integers(1000, 5000 - READ_LEN))
                cdna = genome[p:p + READ_LEN].decode()
            else:
                p = int(rng.integers(7000, 10000 - READ_LEN))
                cdna = genome[p:p + READ_LEN].translate(comp)[
                    ::-1].decode()
            f1.write(f"@g{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@g{i}\n{cdna}\n+\n{'F' * READ_LEN}\n")
    # antibody reads: 20 on R2 pattern, 10 on R1 pattern
    a1, a2 = str(tmp / "ab_S1_L001_R1_001.fastq.gz"), \
        str(tmp / "ab_S1_L001_R2_001.fastq.gz")
    with gzip.open(a1, "wt") as f1, gzip.open(a2, "wt") as f2:
        for i in range(30):
            umi = "".join(rng.choice(list("ACGT"), 12))
            filler = "".join(rng.choice(list("ACGT"), READ_LEN - 15))
            if i < 20:
                r1 = wl[i % 4] + umi
                r2 = AB_SEQS[i % 2] + filler
            else:
                r1 = wl[i % 4] + umi + AB_SEQS[2] + filler[:20]
                r2 = "".join(rng.choice(list("ACGT"), READ_LEN))
            f1.write(f"@a{i}\n{r1}\n+\n{'F' * len(r1)}\n")
            f2.write(f"@a{i}\n{r2}\n+\n{'F' * len(r2)}\n")
    out = str(tmp / "out")
    s = run_count(CountConfig(
        fastq_pairs=[(g1, g2)],
        libraries=[LibraryDef([(g1, g2)], "Gene Expression"),
                   LibraryDef([(a1, a2)], "Antibody Capture")],
        reference_path=str(tmp / "ref"), whitelist_path=str(tmp / "wl.txt"),
        feature_ref_csv=str(tmp / "features.csv"),
        chemistry="SC3Pv3", read_len=READ_LEN, batch_size=256,
        secondary_analysis=False, checkpoint=False, write_bam=True,
        sample_id="dialect_test"), out)
    _, records, text = read_bam(os.path.join(out,
                                             "possorted_genome_bam.bam"))
    return s, records, text


def test_rg_header_and_tag(dual_lib_bam_run):
    s, records, text = dual_lib_bam_run
    assert "@RG\tID:dialect_test" in text
    assert all(r["tags"].get("RG") == "dialect_test" for r in records)


def test_tx_an_tags(dual_lib_bam_run):
    s, records, _ = dual_lib_bam_run
    tx = [r for r in records if "TX" in r["tags"]]
    assert len(tx) >= 30
    for r in tx:
        for part in r["tags"]["TX"].split(";"):
            gid, strand = part.split(",")
            assert gid in ("GD", "GE")
            assert strand in "+-"
    # antisense reads would carry AN instead; none in this sense-only run
    assert all("AN" not in r["tags"] or r["tags"]["AN"] for r in records)


def test_feature_records_in_bam(dual_lib_bam_run):
    s, records, _ = dual_lib_bam_run
    fb = [r for r in records if "fr" in r["tags"]]
    assert len(fb) == 30, "all antibody-library reads present in BAM"
    n_conf = 0
    for r in fb:
        assert r["flag"] & 4  # unmapped
        assert len(r["tags"]["fr"]) == 15
        assert len(r["tags"]["fq"]) == 15
        if "fx" in r["tags"]:
            assert r["tags"]["fx"] in ("AB0", "AB1", "AB2")
            assert r["tags"]["fb"] in AB_SEQS
            if r["tags"]["xf"] & 16:  # XF_CONF_FEATURE
                n_conf += 1
    assert n_conf == 30
    # R1-pattern reads made it in (fx == AB2)
    assert sum(1 for r in fb if r["tags"].get("fx") == "AB2") == 10


def test_r1_pattern_counted(dual_lib_bam_run):
    s, _, _ = dual_lib_bam_run
    # 30 usable antibody reads total (20 R2-pattern + 10 R1-pattern)
    from cellranger_tpu.io.matrix_io import CountMatrix
    assert s["usable_reads"] >= 30 + 40 - 2  # all ab + most gex
