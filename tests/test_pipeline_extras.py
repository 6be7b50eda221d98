"""Chemistry detection + aggr pipeline tests."""

import gzip
import json
import os

import numpy as np
import pytest

from cellranger_tpu.io.whitelist import Whitelist
from cellranger_tpu.io.molecule_info import load_molecule_info
from cellranger_tpu.io.matrix_io import CountMatrix
from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
from cellranger_tpu.pipeline.aggr import parse_aggr_csv, run_aggr
from cellranger_tpu.pipeline.count import CountConfig, run_count

from test_count_pipeline import synthetic_run  # fixture


def _write_r1(path, seqs):
    with gzip.open(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'F' * len(s)}\n")


def test_detect_chemistry_v3_vs_v2(tmp_path):
    rng = np.random.default_rng(3)
    v3_bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(200)})
    v2_bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(200)})
    wls = {"3M-february-2018": Whitelist.from_seqs(v3_bcs),
           "737K-august-2016": Whitelist.from_seqs(v2_bcs)}
    # v3-style reads: v3 barcode + 12bp umi
    seqs = [v3_bcs[int(rng.integers(200))] + "".join(rng.choice(list("ACGT"), 12))
            for _ in range(500)]
    _write_r1(str(tmp_path / "r1.fastq.gz"), seqs)
    res = detect_chemistry(str(tmp_path / "r1.fastq.gz"), wls, n_sample=500)
    assert res["chemistry"] == "SC3Pv3"
    assert res["frac"] > 0.9

    # v2-style reads: v2 barcode + 10bp umi (R1 = 26bp, too short for v3 umi)
    seqs2 = [v2_bcs[int(rng.integers(200))] + "".join(rng.choice(list("ACGT"), 10))
             for _ in range(500)]
    _write_r1(str(tmp_path / "r2only.fastq.gz"), seqs2)
    res2 = detect_chemistry(str(tmp_path / "r2only.fastq.gz"), wls, n_sample=500)
    assert res2["chemistry"] == "SC3Pv2"


def test_detect_chemistry_fails_cleanly(tmp_path):
    rng = np.random.default_rng(5)
    wls = {"3M-february-2018": Whitelist.from_seqs(
        sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(50)}))}
    seqs = ["".join(rng.choice(list("ACGT"), 28)) for _ in range(300)]
    _write_r1(str(tmp_path / "junk.fastq.gz"), seqs)
    with pytest.raises(ValueError, match="unable to detect"):
        detect_chemistry(str(tmp_path / "junk.fastq.gz"), wls, n_sample=300)


def test_aggr_two_runs(synthetic_run, tmp_path):
    s = synthetic_run
    outs = []
    for run_i in range(2):
        out = str(tmp_path / f"run{run_i}")
        cfg = CountConfig(fastq_pairs=[(s["r1"], s["r2"])],
                          reference_path=s["ref"], whitelist_path=s["wl"],
                          chemistry="SC3Pv3", read_len=91, batch_size=2048,
                          secondary_analysis=False)
        run_count(cfg, out)
        outs.append(out)

    csv_path = str(tmp_path / "aggr.csv")
    with open(csv_path, "w") as f:
        f.write("sample_id,molecule_h5\n")
        for i, o in enumerate(outs):
            f.write(f"s{i},{os.path.join(o, 'molecule_info.h5')}\n")
    assert len(parse_aggr_csv(csv_path)) == 2

    aggr_out = str(tmp_path / "aggr_out")
    summary = run_aggr(csv_path, aggr_out, secondary_analysis=False)
    assert summary["samples"] == ["s0", "s1"]
    # identical runs -> rates ~1.0, no depth loss
    assert all(abs(r - 1.0) < 1e-9 for r in summary["normalization_rates"])

    filt = CountMatrix.load_h5(os.path.join(aggr_out, "filtered_feature_bc_matrix.h5"))
    # cells from both gem groups, suffixes -1 and -2
    sfx = {b.rsplit(b"-", 1)[1] for b in filt.barcodes}
    assert sfx == {b"1", b"2"}
    assert summary["total_cells"] == filt.shape[1]
    # merged molecule_info sums = both runs
    mi = load_molecule_info(os.path.join(aggr_out, "molecule_info.h5"))
    m0 = load_molecule_info(os.path.join(outs[0], "molecule_info.h5"))
    assert int(mi["count"].sum()) == 2 * int(m0["count"].sum())


def test_aggr_mismatched_features_rejected(synthetic_run, tmp_path):
    s = synthetic_run
    out = str(tmp_path / "runx")
    run_count(CountConfig(fastq_pairs=[(s["r1"], s["r2"])],
                          reference_path=s["ref"], whitelist_path=s["wl"],
                          chemistry="SC3Pv3", read_len=91, batch_size=2048,
                          secondary_analysis=False), out)
    # fake second input with different features
    import h5py
    import shutil
    bad = str(tmp_path / "bad.h5")
    shutil.copyfile(os.path.join(out, "molecule_info.h5"), bad)
    with h5py.File(bad, "a") as f:
        del f["features/id"]
        f["features"].create_dataset("id", data=np.asarray([b"X1", b"X2"]))
    csv_path = str(tmp_path / "aggr2.csv")
    with open(csv_path, "w") as f:
        f.write("sample_id,molecule_h5\n")
        f.write(f"a,{os.path.join(out, 'molecule_info.h5')}\n")
        f.write(f"b,{bad}\n")
    with pytest.raises(ValueError, match="mismatched feature"):
        run_aggr(csv_path, str(tmp_path / "aggr_bad"))


def test_web_summary(synthetic_run, tmp_path):
    from cellranger_tpu.pipeline.websummary import build_web_summary
    s = synthetic_run
    out = str(tmp_path / "ws")
    run_count(CountConfig(fastq_pairs=[(s["r1"], s["r2"])],
                          reference_path=s["ref"], whitelist_path=s["wl"],
                          chemistry="SC3Pv3", read_len=91, batch_size=2048), out)
    p = os.path.join(out, "web_summary.html")
    assert os.path.exists(p)
    content = open(p).read()
    assert "Estimated cells" in content
    assert "Barcode rank" in content
    assert "<svg" in content and "circle" in content  # plots rendered
    assert "t-SNE" in content
    # metric values present
    mj = json.load(open(os.path.join(out, "metrics_summary.json")))
    assert f"{mj['estimated_cells']:,}" in content


def test_multi_config_and_run(synthetic_run, tmp_path):
    from cellranger_tpu.io.multi_config import MultiConfig, run_multi
    import shutil
    s = synthetic_run
    fdir = str(tmp_path / "fq"); os.makedirs(fdir)
    shutil.copy(s["r1"], os.path.join(fdir, "gex_S1_L001_R1_001.fastq.gz"))
    shutil.copy(s["r2"], os.path.join(fdir, "gex_S1_L001_R2_001.fastq.gz"))
    csvp = str(tmp_path / "multi.csv")
    with open(csvp, "w") as f:
        f.write(f"""[gene-expression]
reference,{s['ref']}
chemistry,SC3Pv3

[libraries]
fastq_id,fastqs,feature_types
gex,{fdir},Gene Expression
""")
    cfg = MultiConfig.from_csv(csvp)
    assert cfg.gene_expression["reference"] == s["ref"]
    assert cfg.libraries[0]["feature_types"] == "Gene Expression"

    summary = run_multi(csvp, str(tmp_path / "mout"), s["wl"],
                        read_len=91, batch_size=2048)
    assert summary["count"]["total_reads"] == s["n_reads"]
    assert os.path.exists(str(tmp_path / "mout" / "count" /
                              "filtered_feature_bc_matrix.h5"))

    # malformed: unknown section
    bad = str(tmp_path / "bad.csv")
    open(bad, "w").write("[nope]\nx,y\n")
    with pytest.raises(ValueError, match="unknown section"):
        MultiConfig.from_csv(bad)
    # malformed: no libraries
    bad2 = str(tmp_path / "bad2.csv")
    open(bad2, "w").write("[gene-expression]\nreference,x\n")
    with pytest.raises(ValueError, match="libraries"):
        MultiConfig.from_csv(bad2)


def test_barnyard_multigenome(tmp_path):
    """Two-genome reference: cells expressing one genome classify to it,
    mixed GEMs call Multiplet; gem_classification.csv written."""
    from cellranger_tpu.io.reference import ReferencePackage
    from cellranger_tpu.io.gtf import write_fasta
    rng = np.random.default_rng(12)

    def mk(genome_len, gene, tmpdir, tag):
        g = "".join(rng.choice(list("ACGT"), genome_len)).encode()
        fa = str(tmp_path / f"{tag}.fa"); gt = str(tmp_path / f"{tag}.gtf")
        write_fasta(fa, {"chr1": g})
        open(gt, "w").write(
            f'chr1\tt\texon\t1001\t2500\t.\t+\t.\t'
            f'gene_id "{gene}"; transcript_id "T{gene}"; gene_name "{gene}";\n')
        return g, fa, gt

    gh, fah, gth = mk(8000, "HUMG", tmp_path, "hum")
    gm, fam, gtm = mk(8000, "MUSG", tmp_path, "mus")
    ref = ReferencePackage.build_multi(
        [("hg", fah, gth), ("mm", fam, gtm)], str(tmp_path / "ref"))
    assert ref.genomes == ["hg", "mm"]
    assert ref.genome_of_gene() == ["hg", "mm"]

    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(64)})
    open(tmp_path / "wl.txt", "w").writelines(s + "\n" for s in wl)
    n = 0
    with gzip.open(tmp_path / "b_S1_L001_R1_001.fastq.gz", "wt") as f1, \
         gzip.open(tmp_path / "b_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for ci in range(12):
            for u in range(20):
                umi = "".join(rng.choice(list("ACGT"), 12))
                if ci < 5:
                    src = gh
                elif ci < 10:
                    src = gm
                else:
                    src = gh if u % 2 == 0 else gm  # mixed -> multiplet
                p = int(rng.integers(1000, 2500 - 91))
                f1.write(f"@b{n}\n{wl[ci]}{umi}\n+\n{'F' * 28}\n")
                f2.write(f"@b{n}\n{src[p:p + 91].decode()}\n+\n{'F' * 91}\n")
                n += 1
    out = str(tmp_path / "out")
    s = run_count(CountConfig(
        fastq_pairs=[(str(tmp_path / "b_S1_L001_R1_001.fastq.gz"),
                      str(tmp_path / "b_S1_L001_R2_001.fastq.gz"))],
        reference_path=str(tmp_path / "ref"),
        whitelist_path=str(tmp_path / "wl.txt"), chemistry="SC3Pv3",
        read_len=91, batch_size=512, secondary_analysis=False), out)
    assert s["multigenome_cells_per_genome"]["hg"] == 5
    assert s["multigenome_cells_per_genome"]["mm"] == 5
    assert s["multigenome_observed_multiplets"] == 2
    rows = open(os.path.join(out, "gem_classification.csv")).read().splitlines()
    assert rows[0] == "barcode,hg,mm,call"
    calls = [r.split(",")[-1] for r in rows[1:]]
    assert calls.count("Multiplet") == 2


def test_detect_chemistry_tso_endedness(tmp_path):
    """SC3Pv2 and SC5P-R2 share the whitelist and UMI length; the TSO
    motif on R1 is the 5' signal (reference endedness probe)."""
    import gzip
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(3)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(100)})
    wlp = tmp_path / "wl.txt"
    open(wlp, "w").writelines(s + "\n" for s in wl)
    whitelists = {"737K-august-2016": Whitelist.load(str(wlp))}

    def write_r1(path, with_tso):
        with gzip.open(path, "wt") as f:
            for i in range(400):
                umi = "".join(rng.choice(list("ACGT"), 10))
                tail = ("TTTCTTATATGGG" if with_tso else
                        "".join(rng.choice(list("ACGT"), 13)))
                cdna = "".join(rng.choice(list("ACGT"), 40))
                f.write(f"@r{i}\n{wl[i % 50]}{umi}{tail}{cdna}\n+\n"
                        f"{'F' * 79}\n")

    p5 = str(tmp_path / "five_S1_L001_R1_001.fastq.gz")
    p3 = str(tmp_path / "three_S1_L001_R1_001.fastq.gz")
    write_r1(p5, True)
    write_r1(p3, False)
    d5 = detect_chemistry(p5, whitelists, candidates=("SC3Pv2", "SC5P-R2"))
    d3 = detect_chemistry(p3, whitelists, candidates=("SC3Pv2", "SC5P-R2"))
    assert d5["chemistry"] == "SC5P-R2" and d5["tso_frac"] > 0.9
    assert d3["chemistry"] == "SC3Pv2" and d3["tso_frac"] < 0.05


def test_detect_chemistry_mfrp_probe_bc(tmp_path):
    """SFRP vs MFRP share geometry + whitelist; the probe barcode at
    R2[68:76] hitting the probe whitelist marks the MFRP family."""
    import gzip
    import numpy as np
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(5)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(300)})
    probe_bcs = sorted({"".join(rng.choice(list("ACGT"), 8))
                        for _ in range(24)})
    wls = {"737K-fixed-rna-profiling": Whitelist.from_seqs(wl),
           "probe-barcodes-fixed-rna-profiling-rna":
               Whitelist.from_seqs(probe_bcs)}
    r1p, r2p = str(tmp_path / "m_r1.fastq.gz"), str(tmp_path / "m_r2.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(400):
            bc = wl[i % len(wl)]
            umi = "".join(rng.choice(list("ACGT"), 12))
            probe = "".join(rng.choice(list("ACGT"), 50))
            pbc = probe_bcs[i % len(probe_bcs)]
            r2 = probe + "ACGTACGTACGTACGTAC" + pbc
            f1.write(f"@m{i}\n{bc}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@m{i}\n{r2}\n+\n{'F' * len(r2)}\n")
    res = detect_chemistry(r1p, wls, candidates=("SFRP", "MFRP-RNA"),
                           n_sample=400, r2_path=r2p)
    assert res["chemistry"] == "MFRP-RNA"
    assert res["probe_bc_frac"] >= 0.9
    # without a probe hit (random bases at the probe span) -> SFRP
    r2q = str(tmp_path / "s_r2.fastq.gz")
    with gzip.open(r2q, "wt") as f2:
        for i in range(400):
            r2 = "".join(rng.choice(list("ACGT"), 80))
            f2.write(f"@s{i}\n{r2}\n+\n{'F' * len(r2)}\n")
    res2 = detect_chemistry(r1p, wls, candidates=("SFRP", "MFRP-RNA"),
                            n_sample=400, r2_path=r2q)
    assert res2["chemistry"] == "SFRP"


def test_detect_chemistry_pe_vs_r2(tmp_path):
    """SC5P-PE vs SC5P-R2: a long R1 (cDNA after bc+umi+TSO) plus an R2
    mate marks the paired-end chemistry."""
    import gzip
    import numpy as np
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(6)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(300)})
    wls = {"737K-august-2016": Whitelist.from_seqs(wl)}
    r1p = str(tmp_path / "pe_r1.fastq.gz")
    r2p = str(tmp_path / "pe_r2.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(400):
            bc = wl[i % len(wl)]
            umi = "".join(rng.choice(list("ACGT"), 10))
            cdna = "".join(rng.choice(list("ACGT"), 80))
            f1.write(f"@p{i}\n{bc}{umi}{cdna}\n+\n{'F' * 106}\n")
            f2.write(f"@p{i}\n{cdna}\n+\n{'F' * 80}\n")
    res = detect_chemistry(r1p, wls, candidates=("SC5P-R2", "SC5P-PE"),
                           n_sample=400, r2_path=r2p)
    assert res["chemistry"] == "SC5P-PE"
    # short R1 (bc+umi only): R2-only chemistry
    r1s = str(tmp_path / "se_r1.fastq.gz")
    with gzip.open(r1s, "wt") as f1:
        for i in range(400):
            bc = wl[i % len(wl)]
            umi = "".join(rng.choice(list("ACGT"), 10))
            f1.write(f"@q{i}\n{bc}{umi}\n+\n{'F' * 26}\n")
    res2 = detect_chemistry(r1s, wls, candidates=("SC5P-R2", "SC5P-PE"),
                            n_sample=400, r2_path=r2p)
    assert res2["chemistry"] == "SC5P-R2"


def test_detect_chemistry_oh_overhang(tmp_path):
    """*-OH auto-detect (VERDICT r2 item 9): an overhang-multiplexed run's
    R1[7:9] view draws from the small per-well overhang set, so the top-4
    2-mers cover ~everything; a plain run is near-uniform over 16."""
    import gzip
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(9)
    oh_set = ["AC", "GT", "CA", "TG"]
    wl_oh = sorted({
        "".join(rng.choice(list("ACGT"), 7)) + oh_set[i % 4]
        + "".join(rng.choice(list("ACGT"), 7))
        for i in range(1200)})
    wl_plain = sorted({"".join(rng.choice(list("ACGT"), 16))
                       for _ in range(1200)})

    def write_r1(path, wl, n=1500):
        with gzip.open(path, "wt") as f:
            for i in range(n):
                umi = "".join(rng.choice(list("ACGT"), 12))
                f.write(f"@o{i}\n{wl[i % len(wl)]}{umi}\n+\n{'F' * 28}\n")

    p_oh = str(tmp_path / "oh_S1_L001_R1_001.fastq.gz")
    p_pl = str(tmp_path / "pl_S1_L001_R1_001.fastq.gz")
    write_r1(p_oh, wl_oh)
    write_r1(p_pl, wl_plain)
    d_oh = detect_chemistry(
        p_oh, {"3M-february-2018": Whitelist.from_seqs(wl_oh)},
        candidates=("SC3Pv3",), n_sample=1500)
    d_pl = detect_chemistry(
        p_pl, {"3M-february-2018": Whitelist.from_seqs(wl_plain)},
        candidates=("SC3Pv3",), n_sample=1500)
    assert d_oh["chemistry"] == "SC3Pv3-OH"
    assert d_oh["overhang_top4_frac"] >= 0.95
    assert d_pl["chemistry"] == "SC3Pv3"
    assert d_pl["overhang_top4_frac"] < 0.8

    # low-complexity guard: FEW distinct barcodes (many reads each) with a
    # skewed overhang view must NOT be relabeled as the -OH chemistry
    wl_low = sorted({
        "".join(rng.choice(list("ACGT"), 7)) + oh_set[i % 4]
        + "".join(rng.choice(list("ACGT"), 7))
        for i in range(40)})
    p_lo = str(tmp_path / "lo_S1_L001_R1_001.fastq.gz")
    write_r1(p_lo, wl_low)
    d_lo = detect_chemistry(
        p_lo, {"3M-february-2018": Whitelist.from_seqs(wl_low)},
        candidates=("SC3Pv3",), n_sample=1500)
    assert d_lo["chemistry"] == "SC3Pv3"


def test_detect_chemistry_mfrp_member_resolution(tmp_path):
    """MFRP MEMBER resolution by probe-bc whitelist hits (VERDICT r2 item
    9): an antibody run's probe barcodes hit the Ab whitelist, so MFRP-Ab
    beats MFRP-RNA even though gel-bead geometry is identical."""
    import gzip
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(11)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(300)})
    rna_bcs = sorted({"".join(rng.choice(list("ACGT"), 8))
                      for _ in range(24)})
    ab_bcs = sorted({"".join(rng.choice(list("ACGT"), 8))
                     for _ in range(24)} - set(rna_bcs))
    wls = {"737K-fixed-rna-profiling": Whitelist.from_seqs(wl),
           "probe-barcodes-fixed-rna-profiling-rna":
               Whitelist.from_seqs(rna_bcs),
           "probe-barcodes-fixed-rna-profiling-ab":
               Whitelist.from_seqs(ab_bcs)}
    r1p = str(tmp_path / "ab_r1.fastq.gz")
    r2p = str(tmp_path / "ab_r2.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(400):
            umi = "".join(rng.choice(list("ACGT"), 12))
            probe = "".join(rng.choice(list("ACGT"), 68))
            pbc = ab_bcs[i % len(ab_bcs)]
            f1.write(f"@a{i}\n{wl[i % len(wl)]}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@a{i}\n{probe}{pbc}\n+\n{'F' * 76}\n")
    res = detect_chemistry(r1p, wls,
                           candidates=("SFRP", "MFRP-RNA", "MFRP-Ab"),
                           n_sample=400, r2_path=r2p)
    assert res["chemistry"] == "MFRP-Ab"
    assert res["probe_bc_frac"] >= 0.9


def test_detect_chemistry_sc5p_r1(tmp_path):
    """SC5P-R1 (VERDICT r2 item 9): a TSO-bearing 5' run with NO R2 file
    resolves to the R1-only chemistry; with an R2 it stays R2-based."""
    import gzip
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.pipeline.detect_chemistry import detect_chemistry
    rng = np.random.default_rng(13)
    wl = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(200)})
    wls = {"737K-august-2016": Whitelist.from_seqs(wl)}
    r1p = str(tmp_path / "r1only_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "r1only_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(400):
            umi = "".join(rng.choice(list("ACGT"), 10))
            cdna = "".join(rng.choice(list("ACGT"), 60))
            f1.write(f"@q{i}\n{wl[i % len(wl)]}{umi}TTTCTTATATGGG{cdna}\n"
                     f"+\n{'F' * 99}\n")
            f2.write(f"@q{i}\n{cdna}\n+\n{'F' * 60}\n")
    res = detect_chemistry(r1p, wls,
                           candidates=("SC3Pv2", "SC5P-R2", "SC5P-R1"),
                           n_sample=400)
    assert res["chemistry"] == "SC5P-R1"
    res2 = detect_chemistry(r1p, wls,
                            candidates=("SC3Pv2", "SC5P-R2", "SC5P-R1"),
                            n_sample=400, r2_path=r2p)
    assert res2["chemistry"] == "SC5P-R2"


def test_oh_sibling_map_covers_registry():
    """Every registered *-OH chemistry is reachable from its base via
    OH_SIBLING (ADVICE r3: f"{best}-OH" never matched SC5P-R2-OH-v3)."""
    from cellranger_tpu.io.chemistry import CHEMISTRY_DEFS
    from cellranger_tpu.pipeline.detect_chemistry import OH_SIBLING
    for base, oh in OH_SIBLING.items():
        assert base in CHEMISTRY_DEFS, base
        assert oh in CHEMISTRY_DEFS, oh
        assert CHEMISTRY_DEFS[oh].overhang is not None
    registered_oh = {n for n, c in CHEMISTRY_DEFS.items()
                     if c.overhang is not None and n != "MFRP"}
    assert registered_oh == set(OH_SIBLING.values())
