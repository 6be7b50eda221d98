"""BAM output: format integrity + 10x tag semantics on the synthetic run."""

import os

import numpy as np
import pytest

from cellranger_tpu.pipeline.count import CountConfig, run_count
from bam_reader import read_bam

from test_count_pipeline import synthetic_run  # fixture reuse

READ_LEN = 91


@pytest.fixture(scope="module")
def bam_run(synthetic_run, tmp_path_factory):
    s = synthetic_run
    out = str(tmp_path_factory.mktemp("bamout"))
    cfg = CountConfig(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                      whitelist_path=s["wl"], chemistry="SC3Pv3",
                      read_len=READ_LEN, batch_size=2048, write_bam=True)
    summary = run_count(cfg, out)
    return s, out, summary


def test_bam_parses_and_sorted(bam_run):
    s, out, summary = bam_run
    refs, records, text = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    assert refs[0][0] == "chr1"
    assert "SO:coordinate" in text
    assert len(records) == s["n_reads"]
    mapped = [r for r in records if not (r["flag"] & 4)]
    pos = [(r["ref_id"], r["pos"]) for r in mapped]
    assert pos == sorted(pos), "not position sorted"
    assert len(mapped) / len(records) > 0.99


def test_bam_tags(bam_run):
    s, out, _ = bam_run
    _, records, _ = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    by_name = {r["name"]: r for r in records}
    n_cb = n_gx = n_spliced = n_umi_count = 0
    for r in records:
        assert "CR" in r["tags"] and "UR" in r["tags"] and "CY" in r["tags"]
        assert len(r["tags"]["CR"]) == 16
        assert len(r["tags"]["UR"]) == 12
        if "CB" in r["tags"]:
            n_cb += 1
            assert r["tags"]["CB"].endswith("-1")
            assert r["tags"]["CB"][:-2] in s["wl_seqs"]
        if "GX" in r["tags"]:
            n_gx += 1
            assert r["tags"]["GX"] in ("GA", "GB")
            assert r["tags"]["xf"] & 1  # XF_CONF_MAPPED (bam_tags.rs:45)
            assert r["tags"]["UB"] == r["tags"]["UR"]  # no umi errors injected
        if any(op == "N" for _, op in r["cigar"]):
            n_spliced += 1
            # M-N-M with intron length 800 (GeneA junction)
            ops = [op for _, op in r["cigar"]]
            assert "".join(ops).replace("S", "") == "MNM"
            intron = [l for l, op in r["cigar"] if op == "N"][0]
            assert intron == 800
        if "xf" in r["tags"] and r["tags"]["xf"] & 8:
            n_umi_count += 1
    assert n_cb == len(records)  # all barcodes valid in this dataset
    assert n_gx > 0.9 * len(records)
    assert n_spliced > 50
    # one UMI-count representative per molecule (cells + ambient)
    total_molecules = sum(s["truth"].values()) + len(s["ambient"])
    assert n_umi_count == total_molecules


def test_bam_seq_matches_strand(bam_run):
    s, out, _ = bam_run
    _, records, _ = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    # GeneB reads are reverse-strand: flag 16, seq revcomp'd back = genomic
    import gzip
    from cellranger_tpu.io.gtf import read_fasta
    genome = read_fasta(str(s["root"] / "genome.fa"))["chr1"]
    n_checked = 0
    for r in records[:400]:
        if r["flag"] & 4 or any(op != "M" for _, op in r["cigar"]):
            continue
        alen = sum(l for l, op in r["cigar"] if op == "M")
        gseg = genome[r["pos"]:r["pos"] + alen].decode()
        assert r["seq"] == gseg, f"seq mismatch at {r['pos']}"
        n_checked += 1
    assert n_checked > 100


def test_bai_index(bam_run):
    """The .bai must exist and its chunk voffsets must decode to records."""
    import struct, zlib
    s, out, _ = bam_run
    bam = os.path.join(out, "possorted_genome_bam.bam")
    bai = bam + ".bai"
    assert os.path.exists(bai)
    data = open(bai, "rb").read()
    assert data[:4] == b"BAI\x01"
    n_ref = struct.unpack_from("<i", data, 4)[0]
    assert n_ref == 1
    off = 8
    n_bin = struct.unpack_from("<i", data, off)[0]; off += 4
    assert n_bin > 0
    first_chunk = None
    for _ in range(n_bin):
        b, n_chunk = struct.unpack_from("<Ii", data, off); off += 8
        for _ in range(n_chunk):
            vs, ve = struct.unpack_from("<QQ", data, off); off += 16
            assert ve > vs
            if first_chunk is None or vs < first_chunk:
                first_chunk = vs
    n_win = struct.unpack_from("<i", data, off)[0]; off += 4
    assert n_win >= 1

    # decode the record at the smallest voffset: decompress its BGZF block
    coffs, uoffs = first_chunk >> 16, first_chunk & 0xFFFF
    raw = open(bam, "rb").read()
    # parse BGZF block header at coffs
    xlen = struct.unpack_from("<H", raw, coffs + 10)[0]
    bsize = None
    p = coffs + 12
    endx = p + xlen
    while p < endx:
        si1, si2, slen = raw[p], raw[p + 1], struct.unpack_from("<H", raw, p + 2)[0]
        if si1 == 66 and si2 == 67:
            bsize = struct.unpack_from("<H", raw, p + 4)[0] + 1
        p += 4 + slen
    cdata = raw[coffs + 12 + xlen:coffs + bsize - 8]
    block = zlib.decompress(cdata, -15)
    rec_size = struct.unpack_from("<i", block, uoffs)[0]
    ref_id, pos = struct.unpack_from("<ii", block, uoffs + 4)
    assert ref_id == 0
    # the first indexed record is the first mapped, position-sorted record
    _, records, _ = read_bam(bam)
    first_mapped = next(r for r in records if not r["flag"] & 4)
    assert pos == first_mapped["pos"]
