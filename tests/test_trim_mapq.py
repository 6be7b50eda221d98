"""Read trimming (TSO/polyA) + repeat-honest MAPQ semantics."""

import gzip
import os

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.ops.trim import make_trimmer, TSO_SEQ
from cellranger_tpu.ops import encode

from util import random_genome


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), n))

READ_LEN = 91


def _codes(s: bytes):
    c, v = encode.encode_str(s)
    return c, v


def test_trimmer_polya():
    trim = make_trimmer(READ_LEN)
    rng = np.random.default_rng(1)
    body = _rand(rng, b"CGT", 60)  # no A: clean signal
    read = (body + b"A" * 31).ljust(READ_LEN, b"C")[:READ_LEN]
    codes, _ = _codes(read)
    out = trim(jnp.asarray(codes[None]), jnp.ones((1, READ_LEN), bool))
    assert int(out["retain_end"][0]) == 60
    assert int(out["polya_trimmed"][0]) == 31
    assert bool(out["matched_tso"][0]) is False
    # short polyA run (score < 20) is NOT trimmed
    read2 = (body + b"A" * 10 + body)[:READ_LEN]
    codes2, _ = _codes(read2)
    out2 = trim(jnp.asarray(codes2[None]), jnp.ones((1, READ_LEN), bool))
    assert int(out2["retain_end"][0]) == READ_LEN


def test_trimmer_tso():
    trim = make_trimmer(READ_LEN)
    rng = np.random.default_rng(2)
    body = _rand(rng, b"ACGT", READ_LEN - len(TSO_SEQ))
    read = TSO_SEQ + body
    codes, _ = _codes(read)
    out = trim(jnp.asarray(codes[None]), jnp.ones((1, READ_LEN), bool))
    assert int(out["retain_start"][0]) == len(TSO_SEQ)
    assert bool(out["matched_tso"][0]) is True
    assert int(out["tso_score"][0]) == len(TSO_SEQ)
    # partial TSO hanging off the 5' end (adapter starts before the read)
    read3 = TSO_SEQ[8:] + body + b"ACGTACGT"
    codes3, _ = _codes(read3[:READ_LEN])
    out3 = trim(jnp.asarray(codes3[None]), jnp.ones((1, READ_LEN), bool))
    assert int(out3["retain_start"][0]) == len(TSO_SEQ) - 8
    # 5 mismatches still matches (score 20)
    mut = bytearray(TSO_SEQ)
    for p in (2, 7, 13, 19, 25):
        mut[p] = b"T"[0] if mut[p] != b"T"[0] else b"G"[0]
    codes4, _ = _codes((bytes(mut) + body)[:READ_LEN])
    out4 = trim(jnp.asarray(codes4[None]), jnp.ones((1, READ_LEN), bool))
    assert int(out4["retain_start"][0]) == len(TSO_SEQ)
    assert bool(out4["matched_tso"][0]) is True


def test_trimmer_noop_on_clean_reads():
    trim = make_trimmer(READ_LEN)
    rng = np.random.default_rng(3)
    reads = np.stack([
        _codes(_rand(rng, b"ACGT", READ_LEN))[0]
        for _ in range(32)])
    out = trim(jnp.asarray(reads), jnp.ones((32, READ_LEN), bool))
    # random reads: no trimming (P(score>=20) astronomically small)
    assert (np.asarray(out["retain_start"]) == 0).all()
    assert (np.asarray(out["retain_end"]) == READ_LEN).all()


def _repeat_genome_aligner(n_copies, seed=42, seg_len=400):
    from cellranger_tpu.align.aligner import DeviceIndex, make_aligner
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.gtf import Transcriptome
    rng = np.random.default_rng(seed)
    seg = _rand(rng, b"ACGT", seg_len)
    parts = []
    for i in range(n_copies):
        parts.append(_rand(rng, b"ACGT", 900 + 137 * i))
        parts.append(seg)
    parts.append(_rand(rng, b"ACGT", 1200))
    genome = b"".join(parts)
    txome = Transcriptome(genes=[], transcripts=[])
    gi = GenomeIndex.build({"chr1": genome}, txome)
    didx = DeviceIndex.from_host(gi)
    return make_aligner(didx, READ_LEN), seg, rng


def _align_seg_reads(aligner, seg, rng, n=16):
    rna = np.zeros((n, READ_LEN), np.uint8)
    for i in range(n):
        p = int(rng.integers(0, len(seg) - READ_LEN))
        rna[i], _ = _codes(seg[p:p + READ_LEN])
    out = aligner(jnp.asarray(rna), jnp.ones((n, READ_LEN), bool))
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("n_copies,expect_mapq", [
    (1, 255), (2, 3), (3, 1), (6, 0)])
def test_mapq_semantics_by_copy_number(n_copies, expect_mapq):
    """STAR MAPQ buckets (rna_read.rs:32): 255 unique, 3 for 2 loci, 1 for
    3-4, 0 for >4 — including >D loci, where the r1 candidate cap would
    have reported MAPQ 1 (VERDICT r1 'MAPQ fidelity under repeats')."""
    aligner, seg, rng = _repeat_genome_aligner(n_copies)
    out = _align_seg_reads(aligner, seg, rng)
    assert out["mapped"].all()
    got = np.asarray(out["mapq"])
    assert (got == expect_mapq).sum() >= len(got) - 2, \
        f"{n_copies} copies: mapq {np.unique(got, return_counts=True)}"
    if n_copies > 4:
        assert (out["n_best"] > 4).sum() >= len(got) - 2
        assert out["saturated"].any()


def test_saturated_reads_not_promoted(tmp_path):
    """>4 identical genic copies: reads must NOT be promoted to
    conf-mapped via the multimapper gene path (unexamined loci)."""
    from cellranger_tpu.io.gtf import write_fasta
    from cellranger_tpu.io.reference import ReferencePackage
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    rng = np.random.default_rng(60)
    seg = _rand(rng, b"ACGT", 400)
    parts = []
    for i in range(6):
        parts.append(_rand(rng, b"ACGT", 800 + 111 * i))
        parts.append(seg)
    genome = b"".join(parts) + _rand(rng, b"ACGT", 1000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        # gene covers only the FIRST copy
        f.write('chr1\tt\texon\t801\t1200\t.\t+\t.\t'
                'gene_id "GR"; transcript_id "TR"; gene_name "GR";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    with gzip.open(tmp_path / "s_S1_L001_R1_001.fastq.gz", "wt") as f1, \
            gzip.open(tmp_path / "s_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for i in range(20):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(0, 400 - READ_LEN))
            f1.write(f"@s{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@s{i}\n{seg[p:p + READ_LEN].decode()}\n+\n"
                     f"{'F' * READ_LEN}\n")
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "s_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "s_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"),
        chemistry="SC3Pv3", read_len=READ_LEN, batch_size=256,
        secondary_analysis=False, checkpoint=False),
        str(tmp_path / "out"))
    assert s["conf_mapped_frac"] == 0.0, "saturated reads were promoted"
    assert s["total_molecules"] == 0


def test_trimmed_reads_still_count(tmp_path):
    """Reads wrapped in TSO prefix + polyA tail align to the right gene
    with the adapters masked (aligner.rs:101-166 trim-then-restore)."""
    from cellranger_tpu.io.gtf import write_fasta
    from cellranger_tpu.io.reference import ReferencePackage
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    rng = np.random.default_rng(61)
    genome = _rand(rng, b"CGT", 2000) \
        + _rand(rng, b"ACGT", 3000) \
        + _rand(rng, b"CGT", 1000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t2001\t5000\t.\t+\t.\t'
                'gene_id "GT"; transcript_id "TT"; gene_name "GT";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    body = 91 - 30 - 25  # TSO(30) + cDNA(36) + polyA(25)
    with gzip.open(tmp_path / "t_S1_L001_R1_001.fastq.gz", "wt") as f1, \
            gzip.open(tmp_path / "t_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for i in range(24):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(2000, 5000 - body))
            cdna = (TSO_SEQ.decode() + genome[p:p + body].decode()
                    + "A" * 25)
            f1.write(f"@t{i}\n{wl[i % 4]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@t{i}\n{cdna}\n+\n{'F' * 91}\n")
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "t_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "t_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"),
        chemistry="SC3Pv3", read_len=91, batch_size=256,
        secondary_analysis=False, checkpoint=False),
        str(tmp_path / "out"))
    assert s["tso_frac"] == 1.0
    assert s["polya_trimmed_reads"] == 24
    # a few reads whose 36bp body ends in genomic A's lose those bases to
    # the (correct) polyA trim and drop under the score-30 floor
    assert s["conf_mapped_frac"] >= 20 / 24
    assert s["total_molecules"] == round(s["conf_mapped_frac"] * 24)
