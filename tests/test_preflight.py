"""Preflight validation + mkgtf."""

import gzip
import os

import numpy as np
import pytest

from cellranger_tpu.io.chemistry import get_chemistry
from cellranger_tpu.io.gtf import filter_gtf
from cellranger_tpu.pipeline import preflight as pf
from cellranger_tpu.pipeline.count import CountConfig


def test_check_fastqs_missing_and_empty(tmp_path):
    missing = str(tmp_path / "nope_R1_.fastq.gz")
    empty = str(tmp_path / "empty_R1_.fastq.gz")
    open(empty, "wb").close()
    bad = str(tmp_path / "bad_R1_.fastq")
    open(bad, "w").write("not a fastq\n")
    good = str(tmp_path / "ok_R1_.fastq.gz")
    with gzip.open(good, "wt") as f:
        f.write("@r0\nACGT\n+\nFFFF\n")
    probs = pf.check_fastqs([(missing, None), (empty, None), (bad, None),
                             (good, None)])
    assert any("not found" in p for p in probs)
    assert any("empty" in p for p in probs)
    assert any("not a FASTQ" in p for p in probs)
    assert len(probs) == 3


def test_check_fastqs_r1_too_short(tmp_path):
    r1 = str(tmp_path / "short_R1_.fastq.gz")
    with gzip.open(r1, "wt") as f:
        f.write("@r0\nACGTACGTACGT\n+\nFFFFFFFFFFFF\n")  # 12bp < 16+10
    probs = pf.check_fastqs([(r1, None)], get_chemistry("SC3Pv3"))
    assert any("12bp" in p and "SC3Pv3" in p for p in probs)


def test_check_fastqs_i1_required(tmp_path):
    r1 = str(tmp_path / "v1_R1_.fastq.gz")
    with gzip.open(r1, "wt") as f:
        f.write(f"@r0\n{'A' * 91}\n+\n{'F' * 91}\n")
    probs = pf.check_fastqs([(r1, None)], get_chemistry("SC3Pv1"))
    assert any("I1" in p for p in probs)


def test_check_chemistry_suggests():
    probs = pf.check_chemistry("SC3PV3")
    assert probs and "SC3Pv3" in probs[0]
    assert pf.check_chemistry("SC3Pv3") == []
    assert pf.check_chemistry("auto") == []


def test_check_feature_ref_columns(tmp_path):
    p = str(tmp_path / "f.csv")
    open(p, "w").write("id,name,read\nA,B,R2\n")
    probs = pf.check_feature_ref(p)
    assert probs and "pattern" in probs[0]


def test_check_samples_duplicates():
    probs = pf.check_samples([
        dict(sample_id="a", probe_barcode_ids="BC1"),
        dict(sample_id="a", probe_barcode_ids="BC3"),
        dict(sample_id="b", probe_barcode_ids="BC1|BC2"),
    ])
    assert any("duplicate sample_id" in p for p in probs)
    assert any("BC1" in p for p in probs)


def test_preflight_count_aggregates_problems(tmp_path):
    cfg = CountConfig(fastq_pairs=[(str(tmp_path / "no_R1_.fastq.gz"),
                                    None)],
                      reference_path=str(tmp_path / "noref"),
                      whitelist_path=str(tmp_path / "nowl.txt"),
                      chemistry="BOGUS")
    with pytest.raises(pf.PreflightError) as exc:
        pf.preflight_count(cfg)
    msg = str(exc.value)
    assert "BOGUS" in msg and "not found" in msg
    assert len(exc.value.problems) >= 3  # everything reported at once


def test_mkgtf_filter(tmp_path):
    gtf_in = str(tmp_path / "in.gtf")
    with open(gtf_in, "w") as f:
        f.write("# comment line\n")
        f.write('chr1\tx\texon\t1\t10\t.\t+\t.\tgene_id "A"; '
                'gene_biotype "protein_coding";\n')
        f.write('chr1\tx\texon\t20\t30\t.\t+\t.\tgene_id "B"; '
                'gene_biotype "pseudogene";\n')
        f.write('chr1\tx\texon\t40\t50\t.\t+\t.\tgene_id "C";\n')  # no key
    gtf_out = str(tmp_path / "out.gtf")
    n = filter_gtf(gtf_in, gtf_out,
                   {"gene_biotype": {"protein_coding"}})
    lines = open(gtf_out).read().splitlines()
    assert n == 2
    assert lines[0].startswith("#")
    assert any('gene_id "A"' in l for l in lines)
    assert not any('gene_id "B"' in l for l in lines)
    assert any('gene_id "C"' in l for l in lines)  # rows lacking key kept


def test_mkgtf_cli(tmp_path):
    from cellranger_tpu.cli import main
    gtf_in = str(tmp_path / "in.gtf")
    open(gtf_in, "w").write(
        'chr1\tx\texon\t1\t10\t.\t+\t.\tgene_id "A"; '
        'gene_biotype "protein_coding";\n'
        'chr1\tx\texon\t20\t30\t.\t+\t.\tgene_id "B"; '
        'gene_biotype "lncRNA";\n')
    gtf_out = str(tmp_path / "out.gtf")
    main(["mkgtf", gtf_in, gtf_out,
          "--attribute", "gene_biotype:protein_coding"])
    assert 'gene_id "A"' in open(gtf_out).read()
    assert 'gene_id "B"' not in open(gtf_out).read()
