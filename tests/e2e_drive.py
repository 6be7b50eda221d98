"""End-to-end drive: synthetic run directory -> run_count -> output checks.

Standalone (not a pytest test; run `python tests/e2e_drive.py`): builds a
spliced 2-gene reference + whitelist + gzipped FASTQs on disk with known
ground truth (cells x molecules x duplicate reads, barcode errors, N bases),
runs the public `pipeline.count.run_count`, and verifies the filtered
matrix, molecule count, and cell calls. Then compiles the multi-chip dryrun
on 8 virtual CPU devices.
"""

import gzip
import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def run():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    G = 120_000
    genome_codes = rng.integers(0, 4, G).astype(np.uint8)
    genome = bases[genome_codes].tobytes().decode()

    tmp = tempfile.mkdtemp(prefix="cr_tpu_e2e_")
    print("drive dir:", tmp)

    # ---- reference: FASTA + GTF with one spliced + one unspliced gene ----
    fasta = os.path.join(tmp, "genome.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n")
        for i in range(0, G, 80):
            f.write(genome[i:i + 80] + "\n")
    gtf = os.path.join(tmp, "genes.gtf")
    exons = {
        "G1": [(10_000, 12_000), (15_000, 17_000)],   # spliced, + strand
        "G2": [(60_000, 64_000)],                      # single exon, - strand
    }
    strands = {"G1": "+", "G2": "-"}
    with open(gtf, "w") as f:
        for gname, exs in exons.items():
            s = strands[gname]
            lo, hi = exs[0][0] + 1, exs[-1][1]
            attr = (f'gene_id "{gname}"; gene_name "{gname}"; '
                    f'transcript_id "T_{gname}";')
            f.write(f"chr1\tsyn\tgene\t{lo}\t{hi}\t.\t{s}\t.\t{attr}\n")
            f.write(f"chr1\tsyn\ttranscript\t{lo}\t{hi}\t.\t{s}\t.\t{attr}\n")
            for (a, b) in exs:
                f.write(f"chr1\tsyn\texon\t{a + 1}\t{b}\t.\t{s}\t.\t{attr}\n")

    from cellranger_tpu.io.reference import ReferencePackage
    ref_dir = os.path.join(tmp, "ref")
    ReferencePackage.build(fasta, gtf, ref_dir, genome_name="synth")

    # ---- whitelist + reads with ground truth ----
    from cellranger_tpu.ops import encode
    n_wl = 2000
    wl_seqs = sorted({"".join(rng.choice(list("ACGT"), 16))
                      for _ in range(n_wl + 200)})[:n_wl]
    wl_path = os.path.join(tmp, "whitelist.txt")
    with open(wl_path, "w") as f:
        f.write("\n".join(wl_seqs) + "\n")

    n_cells = 40
    mols_per_cell = 25
    dup_reads = 2
    read_len = 91
    cells = rng.choice(n_wl, n_cells, replace=False)
    r1s, r2s = [], []
    truth = np.zeros((2, n_cells), np.int64)  # gene x cell molecules

    def tx_seq(gname):
        s = "".join(genome[a:b] for (a, b) in exons[gname])
        if strands[gname] == "-":
            comp = str.maketrans("ACGT", "TGCA")
            s = s.translate(comp)[::-1]
        return s

    txs = {g: tx_seq(g) for g in exons}
    seen_umi = set()
    for ci, c in enumerate(cells):
        bc = wl_seqs[c]
        for m in range(mols_per_cell):
            gname = "G1" if (ci + m) % 2 == 0 else "G2"
            gi_ = 0 if gname == "G1" else 1
            while True:
                umi = "".join(rng.choice(list("ACGT"), 12))
                if (c, gi_, umi) not in seen_umi:
                    seen_umi.add((c, gi_, umi))
                    break
            t = txs[gname]
            # 3' assay: cDNA read sense = transcript sense for SC3Pv3 R2
            start = int(rng.integers(0, len(t) - read_len))
            cdna = t[start:start + read_len]
            truth[gi_, ci] += 1
            for d in range(dup_reads):
                # sprinkle: a barcode error on some duplicate reads
                bc_obs = bc
                if d == 1 and m % 5 == 0:
                    p = int(rng.integers(16))
                    alt = "ACGT"[(("ACGT".index(bc[p])) + 1) % 4]
                    bc_obs = bc[:p] + alt + bc[p + 1:]
                r1s.append(bc_obs + umi)
                r2s.append(cdna)
    # junk reads: N bases, garbage barcodes
    for _ in range(50):
        r1s.append("N" * 16 + "A" * 12)
        r2s.append("".join(rng.choice(list("ACGT"), read_len)))

    order = rng.permutation(len(r1s))
    fq1 = os.path.join(tmp, "sample_S1_L001_R1_001.fastq.gz")
    fq2 = os.path.join(tmp, "sample_S1_L001_R2_001.fastq.gz")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        for i, oi in enumerate(order):
            f1.write(f"@read{i}\n{r1s[oi]}\nI\n{'I' * len(r1s[oi])}\n".replace(
                "\nI\n", "\n+\n"))
            f2.write(f"@read{i}\n{r2s[oi]}\n+\n{'I' * len(r2s[oi])}\n")

    # ---- run count ----
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    out_dir = os.path.join(tmp, "outs")
    cfg = CountConfig(
        fastq_pairs=[(fq1, fq2)], reference_path=ref_dir,
        whitelist_path=wl_path, chemistry="SC3Pv3", read_len=read_len,
        batch_size=4096, write_bam=True)
    summary = run_count(cfg, out_dir)

    # ---- checks ----
    n_mol_truth = int(truth.sum())
    assert summary["total_molecules"] == n_mol_truth, \
        (summary["total_molecules"], n_mol_truth)
    assert summary["estimated_cells"] == n_cells, summary["estimated_cells"]
    assert summary["correction_capacity_overflow"] == 0
    sat = summary["sequencing_saturation"]
    assert abs(sat - 0.5) < 1e-6, sat  # exactly 2 reads per molecule

    import h5py
    with h5py.File(os.path.join(out_dir, "filtered_feature_bc_matrix.h5")) as h:
        data = h["matrix/data"][:]
        assert data.sum() == n_mol_truth, (data.sum(), n_mol_truth)
        n_bc = h["matrix/barcodes"].shape[0]
        assert n_bc == n_cells
    assert os.path.exists(os.path.join(out_dir, "possorted_genome_bam.bam"))
    assert os.path.exists(os.path.join(out_dir, "molecule_info.h5"))
    assert os.path.exists(os.path.join(out_dir, "web_summary.html"))
    print("run_count checks passed:", json.dumps(
        {k: summary[k] for k in ("total_reads", "total_molecules",
                                 "estimated_cells", "sequencing_saturation",
                                 "conf_mapped_frac")}))

    # ---- multi-chip dryrun on 8 virtual CPU devices ----
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
    print("dryrun_multichip(8) passed")
    print("E2E DRIVE OK")


if __name__ == "__main__":
    run()
