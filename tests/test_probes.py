"""RTL probe path: CSV parse + device Hurtle-analog alignment."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.io.probe_set import ProbeSet
from cellranger_tpu.ops.probes import make_probe_aligner
from cellranger_tpu.ops import encode

PROBE_LEN = 50
READ_LEN = 50


@pytest.fixture(scope="module")
def probe_set(tmp_path_factory):
    rng = np.random.default_rng(11)
    p = tmp_path_factory.mktemp("ps") / "probes.csv"
    seqs = []
    with open(p, "w") as f:
        f.write("#probe_set_file_format=1.0\n")
        f.write("#panel_name=test_panel\n")
        f.write("gene_id,probe_seq,probe_id,included,region\n")
        for i in range(40):
            s = "".join(rng.choice(list("ACGT"), PROBE_LEN))
            seqs.append(s)
            gene = f"GENE{i // 4}"  # 4 probes per gene
            incl = "FALSE" if i == 39 else "TRUE"
            f.write(f"{gene},{s},{gene}|probe{i},{incl},spliced\n")
    ps = ProbeSet.from_csv(str(p))
    return ps, seqs


def batch(reads):
    B = len(reads)
    rna = np.zeros((B, READ_LEN), np.uint8)
    nm = np.zeros((B, READ_LEN), bool)
    for i, r in enumerate(reads):
        c, v = encode.encode_str(r)
        rna[i, :len(c)] = c
        nm[i, :len(c)] = v
    return jnp.asarray(rna), jnp.asarray(nm)


def test_parse(probe_set):
    ps, seqs = probe_set
    assert ps.probe_len == 50
    assert ps.metadata["panel_name"] == "test_panel"
    assert len(ps.genes) == 10
    assert not ps.included[39]


def test_exact_and_mutant_alignment(probe_set):
    ps, seqs = probe_set
    align = make_probe_aligner(ps, READ_LEN)
    reads = [seqs[0],                       # exact
             seqs[1][:10] + ("A" if seqs[1][10] != "A" else "C") + seqs[1][11:],
             # ^ one mismatch in lhs
             seqs[2][:30] + ("G" if seqs[2][30] != "G" else "T") + seqs[2][31:],
             # ^ one mismatch in rhs
             "".join(np.random.default_rng(1).choice(list("ACGT"), 50)),  # junk
             ]
    rna, nm = batch(reads)
    out = {k: np.asarray(v) for k, v in align(rna, nm).items()}
    assert out["probe"][0] == 0 and out["conf_mapped"][0]
    assert out["score"][0] == 50
    assert out["probe"][1] == 1 and out["conf_mapped"][1]
    assert out["probe"][2] == 2 and out["conf_mapped"][2]
    assert not out["conf_mapped"][3]
    assert out["gene"][0] == 0 and out["gene"][2] == 0  # probes 0-3 -> GENE0


def test_rescue_half(probe_set):
    ps, seqs = probe_set
    align = make_probe_aligner(ps, READ_LEN)
    # lhs has 3 mismatches (not in table even with 1-HD); rhs exact ->
    # rescue lhs by hamming vs probe's lhs: score = 25 - 6 = 19; total 44
    s = seqs[5]
    lhs = list(s[:25])
    for pos in (3, 9, 15):
        lhs[pos] = "A" if lhs[pos] != "A" else "C"
    read = "".join(lhs) + s[25:]
    rna, nm = batch([read])
    out = {k: np.asarray(v) for k, v in align(rna, nm).items()}
    assert out["probe"][0] == 5
    assert out["conf_mapped"][0]
    assert out["score"][0] == 25 + 19


def test_excluded_probe_not_confident(probe_set):
    ps, seqs = probe_set
    align = make_probe_aligner(ps, READ_LEN)
    rna, nm = batch([seqs[39]])
    out = align(rna, nm)
    assert int(out["probe"][0]) == 39
    assert not bool(out["conf_mapped"][0])  # included=FALSE


def test_short_read_no_match(probe_set):
    ps, seqs = probe_set
    align = make_probe_aligner(ps, READ_LEN)
    rna, nm = batch([seqs[0][:20]])  # shorter than half+rescue needs
    out = align(rna, nm)
    # lhs (25bp window) has pad bases -> nmask fails -> no exact lhs;
    # rhs window is mostly padding
    assert not bool(out["conf_mapped"][0])


def test_rtl_pipeline_end_to_end(probe_set, tmp_path):
    """Full SFRP count run: probe alignment replaces the genome."""
    import gzip, os, json
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    from cellranger_tpu.io.matrix_io import CountMatrix
    ps, seqs = probe_set
    rng = np.random.default_rng(77)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(200)})
    wlp = str(tmp_path / "wl.txt")
    open(wlp, "w").writelines(s + "\n" for s in wl)
    # probes.csv already on disk in the fixture's tmp dir? rewrite here
    pcsv = str(tmp_path / "probes.csv")
    with open(pcsv, "w") as f:
        f.write("#probe_set_file_format=1.0\n")
        f.write("gene_id,probe_seq,probe_id,included,region\n")
        for i, s in enumerate(seqs):
            f.write(f"GENE{i // 4},{s},GENE{i // 4}|p{i},TRUE,spliced\n")
    truth = {}
    r1p = str(tmp_path / "t_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "t_S1_L001_R2_001.fastq.gz")
    n = 0
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for ci in range(15):
            bc = wl[ci]
            for g in range(5):
                k = int(rng.integers(3, 8))
                truth[(bc, g)] = k
                for u in range(k):
                    umi = "".join(rng.choice(list("ACGT"), 12))
                    probe = seqs[g * 4 + int(rng.integers(4))]
                    f1.write(f"@p{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
                    f2.write(f"@p{n}\n{probe}\n+\n{'F' * 50}\n")
                    n += 1
    out = str(tmp_path / "out")
    summary = run_count(CountConfig(
        fastq_pairs=[(r1p, r2p)], probe_set_csv=pcsv, whitelist_path=wlp,
        chemistry="SFRP", read_len=50, batch_size=1024,
        secondary_analysis=False), out)
    assert summary["total_reads"] == n
    assert summary["conf_mapped_frac"] == 1.0
    raw = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    assert raw.features.ids == [f"GENE{i}" for i in range(10)]
    bc_to_col = {b: i for i, b in enumerate(raw.barcodes)}
    m = raw.m.toarray()
    for (bc, g), k in truth.items():
        assert m[g, bc_to_col[bc.encode() + b"-1"]] == k


def test_rtl_region_metrics(probe_set, tmp_path):
    import gzip, json, os
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    ps, seqs = probe_set
    rng = np.random.default_rng(5)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(50)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    pcsv = str(tmp_path / "p.csv")
    with open(pcsv, "w") as f:
        f.write("gene_id,probe_seq,probe_id,included,region\n")
        for i, s in enumerate(seqs[:8]):
            region = "spliced" if i < 5 else "unspliced"
            f.write(f"G{i},{s},G{i}|p,TRUE,{region}\n")
    with gzip.open(tmp_path / "q_S1_L001_R1_001.fastq.gz", "wt") as f1, \
         gzip.open(tmp_path / "q_S1_L001_R2_001.fastq.gz", "wt") as f2:
        n = 0
        for i in range(8):
            for u in range(3):
                umi = "".join(rng.choice(list("ACGT"), 12))
                f1.write(f"@q{n}\n{wl[0]}{umi}\n+\n{'F' * 28}\n")
                f2.write(f"@q{n}\n{seqs[i]}\n+\n{'F' * 50}\n")
                n += 1
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "q_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "q_S1_L001_R2_001.fastq.gz"))],
        probe_set_csv=pcsv, whitelist_path=str(tmp_path / "wl.txt"),
        chemistry="SFRP", read_len=50, batch_size=128,
        secondary_analysis=False), str(tmp_path / "out"))
    assert s["probe_reads_spliced"] == 15
    assert s["probe_reads_unspliced"] == 9
