"""MFRP (multiplexed Fixed RNA Profiling): probe barcode extraction,
correction, product barcode space, and per-sample demux.

Reference geometry: chemistry_defs.json MFRP-RNA (gel bead 16bp on R1,
right_probe 8bp at R2 offset 68); demux per [samples] probe_barcode_ids
(DEMUX_PROBE_BC_MATRIX, mro/rna/_basic_sc_rna_counter.mro:233).
"""

import gzip
import os

import numpy as np
import pytest

from cellranger_tpu.io.probe_bc import load_probe_barcodes, assign_probe_bcs
from cellranger_tpu.io.chemistry import get_chemistry

READ_LEN = 50
PROBE_LEN = 50

PBCS = ["AAACCCGG", "GGTTAACC", "CCGGTTAA", "TTAAGGCC"]


def test_load_and_assign(tmp_path):
    p = tmp_path / "pbc.csv"
    with open(p, "w") as f:
        f.write("id,sequence\n")
        for i, s in enumerate(PBCS):
            f.write(f"BC{i+1},{s}\n")
    ids, packed, L = load_probe_barcodes(str(p))
    assert ids == ["BC1", "BC2", "BC3", "BC4"] and L == 8

    from cellranger_tpu.ops import encode

    def pack(s):
        c, _ = encode.encode_str(s)
        return encode.pack_codes_np(c[None, :], 8)[0]

    reads = np.array([pack(PBCS[0]),                    # exact
                      pack("AAACCCGT"),                 # 1mm of BC1
                      pack("AAATTTGG"),                 # 2mm: reject
                      pack(PBCS[2])], np.uint32)
    idx, ok = assign_probe_bcs(reads, packed, 8)
    assert idx.tolist() == [0, 0, -1, 2]
    assert ok.tolist() == [True, True, False, True]


@pytest.fixture(scope="module")
def mfrp_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("mfrp")
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), PROBE_LEN)) for _ in range(20)]
    pcsv = str(root / "probes.csv")
    with open(pcsv, "w") as f:
        f.write("#probe_set_file_format=1.0\n")
        f.write("gene_id,probe_seq,probe_id,included,region\n")
        for i, s in enumerate(seqs):
            f.write(f"GENE{i // 4},{s},GENE{i // 4}|p{i},TRUE,spliced\n")
    pbc_csv = str(root / "pbc.csv")
    with open(pbc_csv, "w") as f:
        f.write("id,sequence\n")
        for i, s in enumerate(PBCS):
            f.write(f"BC{i+1},{s}\n")
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(80)})
    wlp = str(root / "wl.txt")
    open(wlp, "w").writelines(s + "\n" for s in wl)

    # 8 cells per probe barcode 1..3 (BC4 unused); 5 genes x 3-6 umis
    truth = {}  # (bc, pbc_idx, gene) -> umis
    r1p = str(root / "m_S1_L001_R1_001.fastq.gz")
    r2p = str(root / "m_S1_L001_R2_001.fastq.gz")
    n = 0
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for pi in range(3):
            for ci in range(8):
                bc = wl[pi * 8 + ci]
                for g in range(5):
                    k = int(rng.integers(3, 7))
                    truth[(bc, pi, g)] = k
                    for _ in range(k):
                        umi = "".join(rng.choice(list("ACGT"), 12))
                        probe = seqs[g * 4 + int(rng.integers(4))]
                        filler = "".join(rng.choice(list("ACGT"), 18))
                        r2 = probe + filler + PBCS[pi]
                        f1.write(f"@m{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
                        f2.write(f"@m{n}\n{r2}\n+\n{'F' * len(r2)}\n")
                        n += 1
    return dict(root=root, probes=pcsv, pbc=pbc_csv, wl=wlp, r1=r1p, r2=r2p,
                truth=truth, n_reads=n, wl_seqs=wl)


def test_mfrp_count_product_space(mfrp_run, tmp_path):
    from cellranger_tpu.io.matrix_io import CountMatrix
    from cellranger_tpu.pipeline.count import CountConfig, run_count

    s = mfrp_run
    out = str(tmp_path / "out")
    summary = run_count(CountConfig(
        fastq_pairs=[(s["r1"], s["r2"])], probe_set_csv=s["probes"],
        whitelist_path=s["wl"], chemistry="MFRP-RNA", read_len=READ_LEN,
        batch_size=1024, probe_barcode_csv=s["pbc"],
        secondary_analysis=False), out)
    assert summary["total_reads"] == s["n_reads"]
    assert summary["conf_mapped_frac"] == 1.0

    raw = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    bc_to_col = {b: i for i, b in enumerate(raw.barcodes)}
    m = raw.m.toarray()
    for (bc, pi, g), k in s["truth"].items():
        col = bc_to_col[(bc + PBCS[pi]).encode() + b"-1"]
        assert m[g, col] == k

    filt = CountMatrix.load_h5(os.path.join(out, "filtered_feature_bc_matrix.h5"))
    called = {b.decode() for b in filt.barcodes}
    expect = {bc + PBCS[pi] + "-1" for (bc, pi, g) in s["truth"]}
    assert called >= expect

    # demux by [samples] probe_barcode_ids
    from cellranger_tpu.pipeline.demux import demux_probe_samples
    samples = [dict(sample_id="S1", probe_barcode_ids="BC1|BC2"),
               dict(sample_id="S2", probe_barcode_ids="BC3")]
    dsum = demux_probe_samples(out, samples, s["pbc"], str(tmp_path / "dx"))
    assert set(dsum["samples"]) == {"S1", "S2"}
    s1 = CountMatrix.load_h5(os.path.join(
        tmp_path, "dx", "per_sample_outs", "S1",
        "sample_filtered_feature_bc_matrix.h5"))
    s2 = CountMatrix.load_h5(os.path.join(
        tmp_path, "dx", "per_sample_outs", "S2",
        "sample_filtered_feature_bc_matrix.h5"))
    assert all(b.decode()[16:24] in (PBCS[0], PBCS[1]) for b in s1.barcodes)
    assert all(b.decode()[16:24] == PBCS[2] for b in s2.barcodes)
    # every truth cell for probe 0/1 is in S1, probe 2 in S2
    s1_bcs = {b.decode() for b in s1.barcodes}
    s2_bcs = {b.decode() for b in s2.barcodes}
    for (bc, pi, _g) in s["truth"]:
        tgt = s1_bcs if pi < 2 else s2_bcs
        assert bc + PBCS[pi] + "-1" in tgt


def test_mfrp_chemistry_registered():
    c = get_chemistry("MFRP-RNA")
    assert c.probe_bc is not None
    assert (c.probe_bc.read, c.probe_bc.offset, c.probe_bc.length) == ("R2", 68, 8)
    assert get_chemistry("MFRP") is c
