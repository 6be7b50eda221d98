"""Chemistry-specific ingestion paths: SC3Pv1 (I1 barcode), OH overhang
extraction + demux."""

import gzip
import os

import numpy as np

from cellranger_tpu.io.chemistry import get_chemistry
from cellranger_tpu.io.fastq import batches_from_fastqs, find_fastqs
from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.pipeline.count import CountConfig, run_count

READ_LEN = 91


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), n))


def test_sc3pv1_i1_barcode_end_to_end(tmp_path):
    """SC3Pv1: barcode on I1 (14bp), UMI on R2 (10bp), cDNA on R1."""
    rng = np.random.default_rng(81)
    genome = _rand(rng, b"ACGT", 8000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t5000\t.\t+\t.\t'
                'gene_id "G1"; transcript_id "T1"; gene_name "G1";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 14)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    r1p = str(tmp_path / "v1_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "v1_S1_L001_R2_001.fastq.gz")
    i1p = str(tmp_path / "v1_S1_L001_I1_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2, \
            gzip.open(i1p, "wt") as fi:
        for i in range(30):
            umi = "".join(rng.choice(list("ACGT"), 10))
            p = int(rng.integers(1000, 5000 - READ_LEN))
            cdna = genome[p:p + READ_LEN].decode()
            f1.write(f"@v{i}\n{cdna}\n+\n{'F' * READ_LEN}\n")
            f2.write(f"@v{i}\n{umi}\n+\n{'F' * 10}\n")
            fi.write(f"@v{i}\n{wl[i % 5]}\n+\n{'F' * 14}\n")
    # discovery returns the I1 sibling
    triples = find_fastqs(str(tmp_path), include_index=True)
    assert triples == [(r1p, r2p, i1p)]
    s = run_count(CountConfig(
        fastq_pairs=triples, reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv1",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False), str(tmp_path / "out"))
    assert s["total_reads"] == 30
    assert s["valid_barcode_frac"] == 1.0
    assert s["conf_mapped_frac"] == 1.0
    assert s["total_molecules"] == 30


def test_sc3pv1_missing_i1_raises(tmp_path):
    chem = get_chemistry("SC3Pv1")
    with gzip.open(tmp_path / "x_R1_.fastq.gz", "wt") as f:
        f.write("@a\nACGT\n+\nFFFF\n")
    try:
        list(batches_from_fastqs(chem, str(tmp_path / "x_R1_.fastq.gz"),
                                 None, 64, READ_LEN))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "I1" in str(e)


def test_overhang_extraction_and_demux(tmp_path):
    """SC3Pv3-OH: overhang view extracted per read; demux splits the
    filtered matrix by barcode bases [7:9]."""
    rng = np.random.default_rng(82)
    genome = _rand(rng, b"ACGT", 8000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t5000\t.\t+\t.\t'
                'gene_id "G1"; transcript_id "T1"; gene_name "G1";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    # whitelist engineered so barcodes carry AT or GG at positions 7:9
    base = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(12)]
    wl = sorted({b[:7] + oh + b[9:] for b in base for oh in ("AT", "GG")})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    at_bcs = [s for s in wl if s[7:9] == "AT"][:4]
    gg_bcs = [s for s in wl if s[7:9] == "GG"][:4]
    r1p = str(tmp_path / "oh_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "oh_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        i = 0
        for bcs in (at_bcs, gg_bcs):
            for bc in bcs:
                for m in range(8):
                    umi = "".join(rng.choice(list("ACGT"), 12))
                    p = int(rng.integers(1000, 5000 - READ_LEN))
                    f1.write(f"@o{i}\n{bc}{umi}\n+\n{'F' * 28}\n")
                    f2.write(f"@o{i}\n{genome[p:p + READ_LEN].decode()}\n+\n"
                             f"{'F' * READ_LEN}\n")
                    i += 1
    chem = get_chemistry("SC3Pv3-OH")
    # extraction carries the overhang view
    b = next(batches_from_fastqs(chem, r1p, r2p, 256, READ_LEN))
    assert b.overhang_packed is not None
    from cellranger_tpu.ops import encode
    oh0 = encode.decode_codes(
        encode.unpack_np(b.overhang_packed[0], 2)).decode()
    assert oh0 in ("AT", "GG")

    out = str(tmp_path / "out")
    s = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv3-OH",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False, force_cells=8), out)
    assert s["estimated_cells"] == 8
    from cellranger_tpu.pipeline.demux import demux_overhang_samples
    summary = demux_overhang_samples(
        out, [dict(sample_id="sA", overhang_ids="AT"),
              dict(sample_id="sB", overhang_ids="GG")],
        chem, str(tmp_path / "demux"))
    assert summary["samples"] == {"sA": 4, "sB": 4}
    assert summary["n_unassigned"] == 0
    assert os.path.exists(os.path.join(
        tmp_path, "demux", "per_sample_outs", "sA",
        "sample_filtered_feature_bc_matrix.h5"))
