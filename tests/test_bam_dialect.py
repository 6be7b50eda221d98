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
    """Exonic reads carry the transcript-projected TX form
    'tx_id,{strand}{pos},{cigar}' (transcript.rs:171, align_to_transcript);
    these fixture reads sit wholly inside single-exon transcripts, so every
    TX entry must project with a full-length M cigar and in-range pos."""
    s, records, _ = dual_lib_bam_run
    tx = [r for r in records if "TX" in r["tags"]]
    assert len(tx) >= 30
    tx_len = {"TD": 4000, "TE": 3000}
    for r in tx:
        for part in r["tags"]["TX"].split(";"):
            tid, spos, cigar = part.split(",")
            assert tid in ("TD", "TE")
            assert spos[0] == "+"   # sense entries
            pos = int(spos[1:])
            assert 0 <= pos <= tx_len[tid] - READ_LEN
            assert cigar == f"{READ_LEN}M"
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


def test_project_tx_spliced_and_reverse():
    """Unit: _project_tx handles junction-spanning segments and the
    reverse-strand position/clip flip (transcript.rs:536-545)."""
    from cellranger_tpu.pipeline.bam_out import BamCollector
    # transcript: exons [100,200) + [300,450) on chrom 0, forward
    starts = np.asarray([100, 300], np.int64)
    ends = np.asarray([200, 450], np.int64)
    cum = np.asarray([0, 100], np.int64)
    fwd = ("T1", 0, False, starts, ends, cum, 250)
    rev = ("T1", 0, True, starts, ends, cum, 250)
    # read: 40 bases ending at the donor + 51 from the acceptor
    segs = [(160, 200), (300, 351)]
    assert BamCollector._project_tx(fwd, 0, segs, 0, 0) == "60,91M"
    # reverse-strand transcript: pos = 250 - (60 + 91)
    assert BamCollector._project_tx(rev, 0, segs, 3, 5) == "99,5S91M3S"
    # wrong chrom / segment crossing the junction off-exon -> None
    assert BamCollector._project_tx(fwd, 1, segs, 0, 0) is None
    assert BamCollector._project_tx(fwd, 0, [(160, 210)], 0, 0) is None
    # junction mismatch: first segment stops short of the exon end
    assert BamCollector._project_tx(fwd, 0, [(150, 195), (300, 340)],
                                    0, 0) is None


def test_umi_count_min_qname_tie_break(tmp_path):
    """The UMI_COUNT representative is the min-(raw UMI, qname) read of the
    molecule (mark_dups.rs:147-151), NOT the first in coordinate order:
    name zz read placed earlier on the genome must NOT take the flag."""
    rng = np.random.default_rng(97)
    genome = _rand(rng, b"ACGT", 12_000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t9000\t.\t+\t.\t'
                'gene_id "GZ"; transcript_id "TZ"; gene_name "GeneZ";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(8)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    umi = "ACACACACACAC"
    g1 = str(tmp_path / "t_S1_L001_R1_001.fastq.gz")
    g2 = str(tmp_path / "t_S1_L001_R2_001.fastq.gz")
    with gzip.open(g1, "wt") as f1, gzip.open(g2, "wt") as f2:
        # same (bc, umi, gene): zz maps EARLIER on the genome than aa
        for name, p in (("zz", 1500), ("aa", 6000)):
            f1.write(f"@{name}\n{wl[0]}{umi}\n+\n{'F' * 28}\n")
            cdna = genome[p:p + READ_LEN].decode()
            f2.write(f"@{name}\n{cdna}\n+\n{'F' * READ_LEN}\n")
    s = run_count(CountConfig(
        fastq_pairs=[(g1, g2)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv3",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False, write_bam=True), str(tmp_path / "out"))
    assert s["total_molecules"] == 1
    _, records, _ = read_bam(str(tmp_path / "out" /
                                 "possorted_genome_bam.bam"))
    by = {r["name"]: r for r in records}
    assert by["aa"]["tags"]["xf"] & 8      # min qname wins
    assert not (by["zz"]["tags"]["xf"] & 8)
    assert by["zz"]["pos"] < by["aa"]["pos"]


def test_molecule_info_real_library_table(dual_lib_bam_run, tmp_path_factory):
    """library_idx is threaded per molecule from spill through dedup
    (molecule_counter.py:90-104): GEX molecules carry the GEX library's
    index, antibody molecules the antibody library's, and library_info
    lists every configured library."""
    from cellranger_tpu.io.molecule_info import load_molecule_info
    # the fixture's count out dir
    out = None
    for d in tmp_path_factory.getbasetemp().glob("dialect*/out"):
        out = d
    mi = load_molecule_info(str(out / "molecule_info.h5"))
    assert [li["library_type"] for li in mi["library_info"]] == \
        ["Gene Expression", "Antibody Capture"]
    fid = mi["features_id"]
    n_genes = sum(1 for x in fid if not x.startswith(b"AB"))
    is_fb = mi["feature_idx"] >= n_genes
    assert len(mi["library_idx"]) > 0
    assert np.array_equal(mi["library_idx"] == 1, is_fb)


def test_per_sample_bam_filter(dual_lib_bam_run, tmp_path_factory, tmp_path):
    """filter_bam_by_cb copies exactly one sample's records raw, preserving
    order and index validity (per-sample BAM, MULTI_WRITE_PER_SAMPLE_BAM)."""
    from cellranger_tpu.io.bam_filter import filter_bam_by_cb
    out = None
    for d in tmp_path_factory.getbasetemp().glob("dialect*/out"):
        out = d
    src = str(out / "possorted_genome_bam.bam")
    _, all_recs, _ = read_bam(src)
    cbs = sorted({r["tags"]["CB"] for r in all_recs if "CB" in r["tags"]})
    keep = set(cbs[:2])
    dst = str(tmp_path / "sample_alignments.bam")
    n = filter_bam_by_cb(src, dst, keep, read_group="sampleX")
    refs, recs, text = read_bam(dst)
    assert len(recs) == n > 0
    assert all(r["tags"].get("CB") in keep for r in recs)
    assert "@RG\tID:sampleX" in text
    exp = [r["name"] for r in all_recs if r["tags"].get("CB") in keep]
    assert [r["name"] for r in recs] == exp   # order preserved
    assert os.path.exists(dst + ".bai")
