"""End-to-end count pipeline on a synthetic run with known ground truth."""

import gzip
import json
import os

import numpy as np
import pytest

from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.matrix_io import CountMatrix
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.io.whitelist import Whitelist
from cellranger_tpu.pipeline.count import CountConfig, run_count

from util import random_genome, revcomp, make_two_gene_gtf

READ_LEN = 91


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    """Genome + reference package + FASTQs with known per-cell truth."""
    root = tmp_path_factory.mktemp("run")
    rng = np.random.default_rng(99)
    genome = random_genome(rng, 12_000)
    write_fasta(str(root / "genome.fa"), {"chr1": genome})
    make_two_gene_gtf(str(root / "genes.gtf"))
    ref = ReferencePackage.build(str(root / "genome.fa"), str(root / "genes.gtf"),
                                 str(root / "ref"), genome_name="testg")

    wl_seqs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(420)})[:400]
    wl_path = str(root / "wl.txt")
    with open(wl_path, "w") as f:
        f.writelines(s + "\n" for s in wl_seqs)

    # ground truth: 30 cells x both genes; ambient barcodes with 1-2 reads
    cells = wl_seqs[:30]
    ambient = wl_seqs[30:230]
    truth = {}  # (bc, gene_idx) -> umi count
    reads = []  # (bc, umi, cdna)

    def gene_a_read():
        # exon1 [1000,1400): sense = fwd strand read
        p = int(rng.integers(1000, 1400 - READ_LEN))
        return genome[p:p + READ_LEN].decode()

    def gene_a_spliced_read():
        left = int(rng.integers(30, 60))
        return (genome[1400 - left:1400] + genome[2200:2200 + READ_LEN - left]).decode()

    def gene_b_read():
        # GeneB strand '-': sense read is revcomp of genomic segment
        p = int(rng.integers(5000, 5800 - READ_LEN))
        return revcomp(genome[p:p + READ_LEN]).decode()

    def fresh_umis(n, used):
        """n random 12bp UMIs pairwise Hamming>=2 apart within a barcode so
        dedup must not merge them (dedup behavior itself is covered by
        test_dedup.py against the spec oracle)."""
        out = []
        while len(out) < n:
            u = "".join(rng.choice(list("ACGT"), 12))
            if len(set(u)) == 1:
                continue
            ok = all(sum(a != b for a, b in zip(u, v)) >= 2 for v in used)
            if ok:
                used.append(u)
                out.append(u)
        return out

    for ci, bc in enumerate(cells):
        n_a = int(rng.integers(8, 20))
        n_b = int(rng.integers(5, 15))
        truth[(bc, 0)] = n_a
        truth[(bc, 1)] = n_b
        used = []
        for u, umi in enumerate(fresh_umis(n_a, used)):
            maker = gene_a_spliced_read if u % 3 == 0 else gene_a_read
            for _ in range(int(rng.integers(1, 4))):  # 1-3 dup reads per umi
                reads.append((bc, umi, maker()))
        for umi in fresh_umis(n_b, used):
            for _ in range(int(rng.integers(1, 4))):
                reads.append((bc, umi, gene_b_read()))
    for ai, bc in enumerate(ambient):
        umi = "".join(rng.choice(list("ACGT"), 12))
        reads.append((bc, umi, gene_a_read()))

    order = rng.permutation(len(reads))
    r1p, r2p = str(root / "S_S1_L001_R1_001.fastq.gz"), str(root / "S_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in order:
            bc, umi, cdna = reads[i]
            f1.write(f"@r{i}\n{bc}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@r{i}\n{cdna}\n+\n{'F' * len(cdna)}\n")

    return dict(root=root, ref=str(root / "ref"), wl=wl_path, r1=r1p, r2=r2p,
                truth=truth, cells=cells, ambient=ambient, wl_seqs=wl_seqs,
                n_reads=len(reads))


def test_count_end_to_end(synthetic_run, tmp_path):
    s = synthetic_run
    out = str(tmp_path / "out")
    cfg = CountConfig(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                      whitelist_path=s["wl"], chemistry="SC3Pv3",
                      read_len=READ_LEN, batch_size=2048)
    summary = run_count(cfg, out)

    assert summary["total_reads"] == s["n_reads"]
    assert summary["valid_barcode_frac"] == 1.0
    assert summary["mapped_frac"] > 0.99
    assert summary["conf_mapped_frac"] > 0.95

    raw = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    assert raw.features.ids == ["GA", "GB"]
    bc_to_col = {b: i for i, b in enumerate(raw.barcodes)}
    m = raw.m.toarray()
    errors = []
    for (bc, g), n in s["truth"].items():
        col = bc_to_col[bc.encode() + b"-1"]
        if m[g, col] != n:
            errors.append((bc, g, int(m[g, col]), n))
    assert not errors, f"count mismatches: {errors[:10]}"

    # cell calling finds the 30 big cells (ordmag's bootstrap may pull in a
    # stray ambient barcode or two; that's faithful estimator behavior)
    filt = CountMatrix.load_h5(os.path.join(out, "filtered_feature_bc_matrix.h5"))
    called = {b.decode()[:-2] for b in filt.barcodes}
    assert called >= set(s["cells"])
    assert len(called) <= 32

    # metrics file exists and is self-consistent
    with open(os.path.join(out, "metrics_summary.json")) as f:
        mj = json.load(f)
    assert 30 <= mj["estimated_cells"] <= 32

    # per-phase perf trace (_perf analog)
    with open(os.path.join(out, "_perf.json")) as f:
        pj = json.load(f)
    names = [p["name"] for p in pj["phases"]]
    assert "pass2_correct_align_annotate" in names and "dedup" in names
    assert pj["total_wall_s"] > 0

    # molecule_info.h5 round-trips and agrees with the matrix
    from cellranger_tpu.io.molecule_info import load_molecule_info
    mi = load_molecule_info(os.path.join(out, "molecule_info.h5"))
    assert mi["file_version"] == 6
    assert len(mi["barcode_idx"]) == mj["total_molecules"]
    # per-(bc,gene) molecule counts match matrix entries
    import collections
    mc = collections.Counter(zip(mi["barcode_idx"].tolist(),
                                 mi["feature_idx"].tolist()))
    for (bci, g), n in list(mc.items())[:50]:
        assert raw.m[g, bci] == n
    assert (np.diff(mi["barcode_idx"]) >= 0).all(), "molecules sorted by bc"
    total_truth_umis = sum(s["truth"].values())
    assert int(raw.m[:, [bc_to_col[c.encode() + b"-1"] for c in s["cells"]]].sum()) \
        == total_truth_umis


def test_multimapper_gene_promotion(tmp_path):
    """A read mapping equally to two loci where only one is genic gets
    promoted to conf-mapped (read.rs:117-149 semantics)."""
    import gzip
    from cellranger_tpu.io.reference import ReferencePackage
    rng = np.random.default_rng(55)
    seg = ("".join(rng.choice(list("ACGT"), 400))).encode()
    filler1 = ("".join(rng.choice(list("ACGT"), 1000))).encode()
    filler2 = ("".join(rng.choice(list("ACGT"), 2000))).encode()
    # duplicate segment: once inside a gene, once intergenic
    genome = filler1 + seg + filler2 + seg + filler1
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        # gene covers the FIRST copy only: [1000, 1400) -> GTF 1-based 1001..1400
        f.write('chr1\tt\texon\t1001\t1400\t.\t+\t.\t'
                'gene_id "GM"; transcript_id "TM"; gene_name "GM";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    with gzip.open(tmp_path / "m_S1_L001_R1_001.fastq.gz", "wt") as f1, \
         gzip.open(tmp_path / "m_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for i in range(20):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(0, 400 - READ_LEN))
            cdna = seg[p:p + READ_LEN].decode()
            f1.write(f"@mm{i}\n{wl[i % 5]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@mm{i}\n{cdna}\n+\n{'F' * READ_LEN}\n")
    out = str(tmp_path / "out")
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "m_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "m_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"), whitelist_path=str(tmp_path / "wl.txt"),
        chemistry="SC3Pv3", read_len=READ_LEN, batch_size=256,
        secondary_analysis=False), out)
    # every read is a 2-locus multimapper, but only one locus is genic:
    # promotion must recover them as confidently mapped to GM
    assert s["conf_mapped_frac"] == 1.0
    assert s["total_molecules"] == 20


def test_checkpoint_resume(synthetic_run, tmp_path):
    """Re-running count into the same out_dir resumes from the saved
    molecule table (pipestance analog) and reproduces the matrix exactly;
    changed inputs invalidate the checkpoint."""
    s = synthetic_run
    out = str(tmp_path / "out")
    cfg = CountConfig(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                      whitelist_path=s["wl"], chemistry="SC3Pv3",
                      read_len=READ_LEN, batch_size=2048,
                      secondary_analysis=False)
    s1 = run_count(cfg, out)
    assert os.path.exists(os.path.join(out, "_checkpoint", "manifest.json"))
    m1 = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))

    # resumed run: passes are skipped (no aligner work), outputs identical
    import cellranger_tpu.pipeline.count as cnt
    import unittest.mock as mock
    with mock.patch.object(cnt, "_make_step",
                           side_effect=AssertionError("must not realign")):
        s2 = run_count(cfg, out)
    m2 = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    assert (m1.m != m2.m).nnz == 0
    assert s2["total_molecules"] == s1["total_molecules"]
    assert s2["total_reads"] == s1["total_reads"]
    assert s2["conf_mapped_frac"] == s1["conf_mapped_frac"]

    # fingerprint invalidation: a changed input FASTQ forces a fresh run
    from cellranger_tpu.pipeline.checkpoint import (CountCheckpoint,
                                                    count_fingerprint)
    import shutil
    r1b = str(tmp_path / "o_S1_L001_R1_001.fastq.gz")
    shutil.copy(s["r1"], r1b)
    cfg2 = CountConfig(fastq_pairs=[(r1b, s["r2"])], reference_path=s["ref"],
                       whitelist_path=s["wl"], chemistry="SC3Pv3",
                       read_len=READ_LEN, batch_size=2048)
    assert count_fingerprint(cfg2) != count_fingerprint(cfg)
    assert CountCheckpoint(out, count_fingerprint(cfg2)).load("molecules") \
        is None


def test_three_locus_gene_promotion(tmp_path):
    """A read mapping equally to THREE loci where exactly one is genic is
    still promoted (read.rs:117-149 considers every alignment, not two)."""
    import gzip
    from cellranger_tpu.io.reference import ReferencePackage
    rng = np.random.default_rng(56)
    seg = ("".join(rng.choice(list("ACGT"), 400))).encode()
    f1_ = ("".join(rng.choice(list("ACGT"), 1000))).encode()
    f2_ = ("".join(rng.choice(list("ACGT"), 2000))).encode()
    f3_ = ("".join(rng.choice(list("ACGT"), 1500))).encode()
    # triplicated segment: one genic copy, two intergenic copies
    genome = f1_ + seg + f2_ + seg + f3_ + seg + f1_
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t1400\t.\t+\t.\t'
                'gene_id "GM"; transcript_id "TM"; gene_name "GM";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    with gzip.open(tmp_path / "m_S1_L001_R1_001.fastq.gz", "wt") as r1, \
         gzip.open(tmp_path / "m_S1_L001_R2_001.fastq.gz", "wt") as r2:
        for i in range(20):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(0, 400 - READ_LEN))
            cdna = seg[p:p + READ_LEN].decode()
            r1.write(f"@mm{i}\n{wl[i % 5]}{umi}\n+\n{'F' * 28}\n")
            r2.write(f"@mm{i}\n{cdna}\n+\n{'F' * READ_LEN}\n")
    out = str(tmp_path / "out")
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "m_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "m_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"), whitelist_path=str(tmp_path / "wl.txt"),
        chemistry="SC3Pv3", read_len=READ_LEN, batch_size=256,
        secondary_analysis=False), out)
    assert s["conf_mapped_frac"] == 1.0
    assert s["total_molecules"] == 20


def test_mesh_run_count_byte_identical(synthetic_run, tmp_path):
    """PRODUCTION multi-chip: run_count over an 8-device mesh must produce
    byte-identical outputs to the single-chip run (VERDICT r1 item 1)."""
    from cellranger_tpu.parallel.mesh import make_mesh
    s = synthetic_run
    base = dict(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                whitelist_path=s["wl"], chemistry="SC3Pv3",
                read_len=READ_LEN, batch_size=2048,
                secondary_analysis=False, checkpoint=False)
    out1, out2 = str(tmp_path / "single"), str(tmp_path / "mesh8")
    sum1 = run_count(CountConfig(**base), out1)
    sum2 = run_count(CountConfig(**base), out2, mesh=make_mesh(8))

    for k, v in sum1.items():
        if k in ("wall_time_s",):
            continue
        assert sum2[k] == v, f"summary[{k}]: {sum2[k]} != {v}"
    m1 = CountMatrix.load_h5(os.path.join(out1, "raw_feature_bc_matrix.h5"))
    m2 = CountMatrix.load_h5(os.path.join(out2, "raw_feature_bc_matrix.h5"))
    assert (m1.m != m2.m).nnz == 0
    from cellranger_tpu.io.molecule_info import load_molecule_info
    mi1 = load_molecule_info(os.path.join(out1, "molecule_info.h5"))
    mi2 = load_molecule_info(os.path.join(out2, "molecule_info.h5"))
    for k in ("barcode_idx", "feature_idx", "umi", "count"):
        np.testing.assert_array_equal(mi1[k], mi2[k], err_msg=k)


def test_correction_batch_size_invariant(synthetic_run, tmp_path):
    """Host posterior correction has no per-batch capacity: with HALF the
    reads carrying a 1-base barcode error, every correctable barcode is
    corrected regardless of batch size and the outputs are identical
    (barcode_correction.rs:265 corrects all of them)."""
    import gzip
    s = synthetic_run
    rng = np.random.default_rng(77)
    # rewrite R1 with 1-base barcode errors on half the reads
    r1e = str(tmp_path / "e_S1_L001_R1_001.fastq.gz")
    with gzip.open(s["r1"], "rt") as f, gzip.open(r1e, "wt") as g:
        i = 0
        while True:
            name = f.readline()
            if not name:
                break
            seq = f.readline().rstrip()
            plus = f.readline()
            qual = f.readline()
            if i % 2 == 0:
                p = int(rng.integers(0, 16))
                wrong = {"A": "C", "C": "G", "G": "T", "T": "A"}[seq[p]]
                seq = seq[:p] + wrong + seq[p + 1:]
            g.write(f"{name}{seq}\n{plus}{qual}")
            i += 1
    base = dict(fastq_pairs=[(r1e, s["r2"])], reference_path=s["ref"],
                whitelist_path=s["wl"], chemistry="SC3Pv3",
                read_len=READ_LEN, batch_size=2048,
                secondary_analysis=False, checkpoint=False)
    out1 = str(tmp_path / "b2048")
    sum1 = run_count(CountConfig(**base), out1)
    assert sum1["corrected_barcode_reads"] > 0
    base2 = dict(base, batch_size=512)
    out2 = str(tmp_path / "b512")
    sum2 = run_count(CountConfig(**base2), out2)
    assert sum2["valid_barcode_reads"] == sum1["valid_barcode_reads"]
    assert sum2["corrected_barcode_reads"] == sum1["corrected_barcode_reads"]
    m1 = CountMatrix.load_h5(os.path.join(out1, "raw_feature_bc_matrix.h5"))
    m2 = CountMatrix.load_h5(os.path.join(out2, "raw_feature_bc_matrix.h5"))
    assert (m1.m != m2.m).nnz == 0, "batch size changed the matrix"


def test_partitioned_dedup_matches_single(synthetic_run, tmp_path, monkeypatch):
    """Forcing tiny dedup partitions must not change the matrix."""
    import cellranger_tpu.pipeline.count as cnt
    s = synthetic_run
    out1 = str(tmp_path / "single")
    run_count(CountConfig(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                          whitelist_path=s["wl"], chemistry="SC3Pv3",
                          read_len=READ_LEN, batch_size=2048,
                          secondary_analysis=False), out1)
    monkeypatch.setattr(cnt, "DEDUP_CHUNK_LIMIT", 256)  # force many partitions
    out2 = str(tmp_path / "parts")
    run_count(CountConfig(fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
                          whitelist_path=s["wl"], chemistry="SC3Pv3",
                          read_len=READ_LEN, batch_size=2048,
                          secondary_analysis=False), out2)
    m1 = CountMatrix.load_h5(os.path.join(out1, "raw_feature_bc_matrix.h5"))
    m2 = CountMatrix.load_h5(os.path.join(out2, "raw_feature_bc_matrix.h5"))
    assert (m1.m != m2.m).nnz == 0, "partitioned dedup changed the matrix"
