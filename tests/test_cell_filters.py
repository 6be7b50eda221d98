"""Cell-calling completeness: gradient mode, mito-% filter, global
min-UMI filter, highly-corrected-reads aggregate signal."""

import gzip

import numpy as np
import scipy.sparse as sp

from cellranger_tpu.analysis import cell_calling as cc
from cellranger_tpu.analysis.aggregates import detect_highly_corrected_bcs


def test_gradient_caller_finds_knee():
    """Rank plot with a sharp cliff: ~200 cells at ~1000 UMIs, ambient tail
    at ~5; the steepest-gradient cut lands at the cliff."""
    rng = np.random.default_rng(4)
    cells = rng.integers(800, 1200, 200)
    ambient = rng.integers(1, 12, 5000)
    counts = np.concatenate([cells, ambient]).astype(np.int64)
    rng.shuffle(counts)
    idx, m = cc.call_cells_gradient(counts, recovered_cells=200)
    assert 180 <= m["filtered_bcs"] <= 260, m
    # every called barcode outranks every uncalled cell-sized barcode
    called = np.zeros(len(counts), bool)
    called[idx] = True
    assert counts[called].min() >= 500


def test_gradient_caller_tiny_input():
    idx, m = cc.call_cells_gradient(np.asarray([50, 40, 3, 2, 1, 0]),
                                    recovered_cells=2)
    assert m["filtered_bcs"] >= 1
    assert 0 in idx


def test_mito_gene_rows_and_filter():
    ids = ["ENSG00000000001", "ENSG00000198886",  # 2nd is MT-ND4
           "hg38_ENSG00000198888", "ENSMUSG00000064341", "GENEX"]
    rows = cc.mito_gene_rows(ids)
    assert list(rows) == [1, 2, 3]

    # matrix [F=3, N=4]: barcode 2 is 80% mito
    m = sp.csc_matrix(np.asarray([
        [100, 100, 20, 100],    # normal gene
        [  5,  10, 80,   0],    # mito gene
        [  0,   0,  0,  10]]))
    kept, removed, pct = cc.apply_mito_filter(
        m, np.asarray([0, 1, 2, 3]), np.asarray([1]), max_mito_percent=50.0)
    assert list(removed) == [2]
    assert list(kept) == [0, 1, 3]
    assert pct[2] > 50


def test_min_umi_filter():
    umis = np.asarray([500, 40, 3, 900])
    kept = cc.apply_min_umi_filter(umis, np.asarray([0, 1, 2, 3]), 50)
    assert list(kept) == [0, 3]
    # disabled threshold = keep all
    kept2 = cc.apply_min_umi_filter(umis, np.asarray([0, 1, 2, 3]), 0)
    assert list(kept2) == [0, 1, 2, 3]


def test_highly_corrected_detector():
    reads = np.asarray([20_000, 20_000, 5_000, 50_000])
    corr = np.asarray([15_000, 1_000, 4_900, 10_000])
    got = detect_highly_corrected_bcs(reads, corr)
    # bc0: 75% corrected & >10k reads -> aggregate. bc2 high frac, low reads.
    assert list(got) == [0]


def test_count_pipeline_mito_and_min_umi(tmp_path):
    """End-to-end: a cell whose UMIs are mostly mitochondrial is dropped by
    the mito filter; a small cell is dropped by min-UMI."""
    from cellranger_tpu.io.gtf import write_fasta
    from cellranger_tpu.io.reference import ReferencePackage
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    rng = np.random.default_rng(90)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = bytes(rng.choice(bases, 10_000))
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t4000\t.\t+\t.\t'
                'gene_id "ENSG00000000010"; transcript_id "TN"; '
                'gene_name "NORM";\n')
        f.write('chr1\tt\texon\t5001\t8000\t.\t+\t.\t'
                'gene_id "ENSG00000198886"; transcript_id "TM"; '
                'gene_name "MT-ND4";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(60)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    READ_LEN = 91

    def reads_for(bc, n_norm, n_mito, out):
        for _ in range(n_norm):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(1000, 4000 - READ_LEN))
            out.append((bc, umi, genome[p:p + READ_LEN].decode()))
        for _ in range(n_mito):
            umi = "".join(rng.choice(list("ACGT"), 12))
            p = int(rng.integers(5000, 8000 - READ_LEN))
            out.append((bc, umi, genome[p:p + READ_LEN].decode()))

    rows = []
    for bc in wl[:6]:
        reads_for(bc, 30, 2, rows)          # normal cells
    reads_for(wl[6], 2, 30, rows)           # mito-dominated cell
    reads_for(wl[7], 4, 0, rows)            # tiny cell (min-UMI casualty)
    r1p = str(tmp_path / "f_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "f_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i, (bc, umi, cdna) in enumerate(rows):
            f1.write(f"@f{i}\n{bc}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@f{i}\n{cdna}\n+\n{'F' * len(cdna)}\n")
    s = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv3",
        read_len=READ_LEN, batch_size=256, secondary_analysis=False,
        checkpoint=False, force_cells=8,
        max_mito_percent=50.0, global_minimum_umis=10),
        str(tmp_path / "out"))
    # 8 forced cells - 1 mito-dominated - 1 under min-UMI = 6
    assert s["cells_removed_mito_filter"] == 1
    assert s["estimated_cells"] == 6  # post-filter cells
    from cellranger_tpu.io.matrix_io import CountMatrix
    import os
    filt = CountMatrix.load_h5(
        os.path.join(tmp_path, "out", "filtered_feature_bc_matrix.h5"))
    assert filt.m.shape[1] == 6
