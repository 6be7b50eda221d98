"""Multi-gem-well processing: per-well count + MERGE_GEM_WELLS merge."""

import gzip
import json
import os

import numpy as np

from cellranger_tpu.io.gtf import write_fasta
from cellranger_tpu.io.matrix_io import CountMatrix
from cellranger_tpu.io.molecule_info import load_molecule_info
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.pipeline.count import CountConfig
from cellranger_tpu.pipeline.multi_gem import run_count_gem_wells

READ_LEN = 91


def _rand(rng, alphabet: bytes, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, np.uint8), n))


def test_two_gem_wells_merge(tmp_path):
    rng = np.random.default_rng(99)
    genome = _rand(rng, b"ACGT", 10_000)
    write_fasta(str(tmp_path / "g.fa"), {"chr1": genome})
    with open(tmp_path / "g.gtf", "w") as f:
        f.write('chr1\tt\texon\t1001\t6000\t.\t+\t.\t'
                'gene_id "GW"; transcript_id "TW"; gene_name "GW";\n')
    ReferencePackage.build(str(tmp_path / "g.fa"), str(tmp_path / "g.gtf"),
                           str(tmp_path / "ref"))
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(40)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)

    def make_well(name, bcs, n_mols):
        r1 = str(tmp_path / f"{name}_S1_L001_R1_001.fastq.gz")
        r2 = str(tmp_path / f"{name}_S1_L001_R2_001.fastq.gz")
        with gzip.open(r1, "wt") as f1, gzip.open(r2, "wt") as f2:
            i = 0
            for bc in bcs:
                for _ in range(n_mols):
                    umi = "".join(rng.choice(list("ACGT"), 12))
                    p = int(rng.integers(1000, 6000 - READ_LEN))
                    f1.write(f"@{name}{i}\n{bc}{umi}\n+\n{'F' * 28}\n")
                    f2.write(f"@{name}{i}\n"
                             f"{genome[p:p + READ_LEN].decode()}\n+\n"
                             f"{'F' * READ_LEN}\n")
                    i += 1
        return r1, r2

    w1 = make_well("w1", wl[:4], 12)
    w2 = make_well("w2", wl[2:8], 9)   # overlapping barcodes on purpose
    base = dict(reference_path=str(tmp_path / "ref"),
                whitelist_path=str(tmp_path / "wl.txt"),
                chemistry="SC3Pv3", read_len=READ_LEN, batch_size=256,
                checkpoint=False)
    out = str(tmp_path / "out")
    merged = run_count_gem_wells(
        [CountConfig(fastq_pairs=[w1], gem_group=1, force_cells=4, **base),
         CountConfig(fastq_pairs=[w2], gem_group=2, force_cells=6, **base)],
        out, secondary_analysis=False)

    assert merged["n_gem_wells"] == 2
    assert merged["total_reads"] == 4 * 12 + 6 * 9
    assert merged["total_molecules"] == 4 * 12 + 6 * 9
    assert merged["estimated_cells"] == 10

    raw = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    # the same physical barcode appears once per well, distinguished by
    # the gem-group suffix
    suffixes = {b.decode().rsplit("-", 1)[1] for b in raw.barcodes}
    assert suffixes == {"1", "2"}
    shared = wl[2].encode()
    assert shared + b"-1" in raw.barcodes and shared + b"-2" in raw.barcodes

    filt = CountMatrix.load_h5(
        os.path.join(out, "filtered_feature_bc_matrix.h5"))
    assert filt.m.shape[1] == 10
    assert int(filt.m.sum()) == 4 * 12 + 6 * 9

    mi = load_molecule_info(os.path.join(out, "molecule_info.h5"))
    assert set(np.unique(mi["gem_group"])) == {1, 2}
    assert len(mi["barcode_idx"]) == merged["total_molecules"]
    # barcode_idx offsets index the merged barcode list per molecule
    assert int(mi["barcode_idx"].max()) < len(raw.barcodes)
    # per-well summaries exposed
    assert merged["per_well"]["gw1"]["estimated_cells"] == 4
    assert merged["per_well"]["gw2"]["estimated_cells"] == 6
