"""Feature Barcode (antibody capture) path: pattern compile, device
extraction, dual-library pipeline."""

import gzip
import os

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.io.feature_ref import (FeatureBarcodeReference,
                                           compile_pattern)
from cellranger_tpu.io.matrix_io import CountMatrix
from cellranger_tpu.ops.features import make_feature_extractor
from cellranger_tpu.ops.bucket_table import BucketTable
from cellranger_tpu.ops import encode
from cellranger_tpu.pipeline.count import CountConfig, LibraryDef, run_count

from test_count_pipeline import synthetic_run  # fixture

AB_SEQS = ["ACGTACGTACGTACG", "TTTTGGGGCCCCAAA", "GACGACGACGACGAC", "CTCTCTCTCTCTCTC"]


def test_compile_pattern():
    p = compile_pattern("5PNNNNNNNNNN(BC)", "R2", 15)
    assert p.anchor5p and not p.anchor3p and p.prefix_len == 10
    p2 = compile_pattern("5P(BC)", "R2", 15)
    assert p2.prefix_len == 0
    p3 = compile_pattern("TTGCTAGGACC(BC)", "R2", 15)
    assert not p3.anchor5p and p3.prefix_len == 11
    with pytest.raises(ValueError):
        compile_pattern("NNNN", "R2", 15)
    with pytest.raises(ValueError):
        compile_pattern("NNNN(BC)", "R2", 15)  # unanchored without fixed bases


def _csv(tmp_path, pattern):
    p = tmp_path / "features.csv"
    with open(p, "w") as f:
        f.write("id,name,read,pattern,sequence,feature_type\n")
        for i, s in enumerate(AB_SEQS):
            f.write(f"AB{i},Ab{i},R2,{pattern},{s},Antibody Capture\n")
    return str(p)


def _extract(ref, reads, read_len=91):
    (pat, (seqs, fidx)), = ref.pattern_groups.items()
    ft = BucketTable.build_exact(
        seqs, np.arange(len(seqs), dtype=np.uint32),
        entries=8, fields=3).with_counts(np.ones(len(seqs), np.int64))
    ex = make_feature_extractor(pat, ft, fidx, read_len)
    B = len(reads)
    rna = np.zeros((B, read_len), np.uint8)
    nm = np.zeros((B, read_len), bool)
    ln = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c, v = encode.encode_str(r)
        rna[i, :len(c)] = c
        nm[i, :len(c)] = v
        ln[i] = len(c)
    return ex(jnp.asarray(rna), jnp.asarray(nm), jnp.asarray(ln))


def test_extract_offset_pattern(tmp_path):
    ref = FeatureBarcodeReference.from_csv(_csv(tmp_path, "5PNNNNNNNNNN(BC)"))
    reads = ["T" * 10 + AB_SEQS[1] + "A" * 40,
             "G" * 10 + AB_SEQS[3] + "C" * 40,
             "G" * 10 + "AAAAAAAAAAAAAAA" + "C" * 40]  # no match
    out = _extract(ref, reads)
    assert np.asarray(out["feature"]).tolist()[:2] == [1, 3]
    assert not bool(out["found"][2])


def test_extract_anchor_pattern(tmp_path):
    ref = FeatureBarcodeReference.from_csv(_csv(tmp_path, "TTGCTAGGACC(BC)"))
    reads = ["ACGT" * 3 + "TTGCTAGGACC" + AB_SEQS[0] + "A" * 20,
             "TTGCTAGGACC" + AB_SEQS[2] + "T" * 40]
    out = _extract(ref, reads)
    assert np.asarray(out["feature"]).tolist() == [0, 2]


def test_extract_one_mismatch_corrects(tmp_path):
    ref = FeatureBarcodeReference.from_csv(_csv(tmp_path, "5P(BC)"))
    mut = "ACGTACGTACGTACC"  # AB0 with last base changed
    out = _extract(ref, [mut + "T" * 40])
    assert bool(out["found"][0]) and int(out["feature"][0]) == 0
    assert bool(out["corrected"][0])


def test_dual_library_pipeline(synthetic_run, tmp_path):
    s = synthetic_run
    rng = np.random.default_rng(31)
    fcsv = _csv(tmp_path, "5PNNNNNNNNNN(BC)")
    # antibody reads: cells 0..9 get AB0 molecules, cells 10..19 get AB1
    ab_truth = {}
    r1p, r2p = str(tmp_path / "ab_S1_L001_R1_001.fastq.gz"), \
        str(tmp_path / "ab_S1_L001_R2_001.fastq.gz")
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        n = 0
        for ci, bc in enumerate(s["cells"][:20]):
            ab = 0 if ci < 10 else 1
            k = int(rng.integers(5, 12))
            ab_truth[(bc, ab)] = k
            for u in range(k):
                umi = "".join(rng.choice(list("ACGT"), 12))
                r2 = "T" * 10 + AB_SEQS[ab] + "A" * 46
                f1.write(f"@a{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
                f2.write(f"@a{n}\n{r2}\n+\n{'F' * len(r2)}\n")
                n += 1
    out = str(tmp_path / "out")
    cfg = CountConfig(
        fastq_pairs=[], reference_path=s["ref"], whitelist_path=s["wl"],
        feature_ref_csv=fcsv,
        libraries=[LibraryDef([(s["r1"], s["r2"])], "Gene Expression"),
                   LibraryDef([(r1p, r2p)], "Antibody Capture")],
        chemistry="SC3Pv3", read_len=91, batch_size=2048)
    summary = run_count(cfg, out)

    raw = CountMatrix.load_h5(os.path.join(out, "raw_feature_bc_matrix.h5"))
    assert raw.features.ids[:2] == ["GA", "GB"]
    assert raw.features.ids[2:] == ["AB0", "AB1", "AB2", "AB3"]
    types = {f.feature_type for f in raw.features.feature_defs}
    assert types == {"Gene Expression", "Antibody Capture"}
    bc_to_col = {b: i for i, b in enumerate(raw.barcodes)}
    m = raw.m.toarray()
    for (bc, ab), k in ab_truth.items():
        col = bc_to_col[bc.encode() + b"-1"]
        assert m[2 + ab, col] == k, (bc, ab, m[2 + ab, col], k)
    # gene counts unaffected by the AB library
    for (bc, g), nexp in list(s["truth"].items())[:20]:
        col = bc_to_col[bc.encode() + b"-1"]
        assert m[g, col] == nexp
    # cell calling still driven by GEX
    assert 30 <= summary["estimated_cells"] <= 32


def test_antibody_aggregate_detection():
    """A GEM enriched in most of the panel is an aggregate; a bright
    singlet enriched in one antibody is not (antibody/analysis.py
    semantics: panel-fraction membership in per-antibody top-25)."""
    from cellranger_tpu.analysis.aggregates import (
        detect_antibody_aggregates, detect_outlier_umi_bcs)
    rng = np.random.default_rng(7)
    F, N = 8, 3000
    counts = rng.poisson(1.0, (F, N)).astype(np.int64)
    cells = rng.choice(N, 60, replace=False)
    for c in cells:           # each cell bright in ONE antibody
        counts[rng.integers(F), c] += 400
    agg = 17                  # aggregate: bright in EVERY antibody
    counts[:, agg] += 500
    called = detect_antibody_aggregates(counts)
    assert agg in called
    assert not set(called) & set(cells.tolist())
    # under 5 signal antibodies: no calls
    assert len(detect_antibody_aggregates(counts[:4])) == 0

    # antigen outlier path: IQR blowout with a 1000-UMI floor
    ag = np.zeros((2, N), np.int64)
    ag[0, :100] = rng.integers(1200, 2000, 100)
    ag[0, 5] = 50_000
    assert detect_outlier_umi_bcs(ag).tolist() == [5]
    ag[0, :100] = rng.integers(100, 300, 100)  # threshold < 1000 floor
    ag[0, 5] = 50_000
    assert len(detect_outlier_umi_bcs(ag)) == 0


def test_call_features_gmm():
    """Two-component mixture separates expressing cells from ambient."""
    from cellranger_tpu.analysis.feature_assigner import call_features
    rng = np.random.default_rng(3)
    C = 400
    counts = np.zeros((2, C), np.int64)
    # guide 0: cells 0..99 express (~100 UMIs), everyone has ~2 ambient
    counts[0] = rng.poisson(2, C)
    counts[0, :100] = rng.poisson(100, 100)
    # guide 1: cells 50..149 express
    counts[1] = rng.poisson(1, C)
    counts[1, 50:150] = rng.poisson(80, 100)
    a = call_features(counts)
    assert a[0, :100].mean() > 0.97 and a[0, 100:].mean() < 0.03
    assert a[1, 50:150].mean() > 0.97
    assert a[1, :50].mean() < 0.03 and a[1, 150:].mean() < 0.03
    # degenerate feature: too few positives -> min-umi fallback
    few = np.zeros((1, C), np.int64)
    few[0, :3] = 50
    assert call_features(few)[0].sum() == 3


def test_crispr_protospacer_calls(synthetic_run, tmp_path):
    """CRISPR library -> crispr_analysis/protospacer_calls_per_cell.csv
    with per-cell guide assignments (feature_assigner.py analog)."""
    s = synthetic_run
    rng = np.random.default_rng(41)
    fcsv = tmp_path / "guides.csv"
    with open(fcsv, "w") as f:
        f.write("id,name,read,pattern,sequence,feature_type\n")
        for i, sq in enumerate(AB_SEQS[:2]):
            f.write(f"GUIDE{i},g{i},R2,5PNNNNNNNNNN(BC),{sq},"
                    "CRISPR Guide Capture\n")
    r1p = str(tmp_path / "cr_S1_L001_R1_001.fastq.gz")
    r2p = str(tmp_path / "cr_S1_L001_R2_001.fastq.gz")
    truth = {}
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        n = 0
        for ci, bc in enumerate(s["cells"]):
            g = 0 if ci < 15 else 1
            truth[bc] = f"GUIDE{g}"
            for u in range(30):          # strongly expressing
                umi = "".join(rng.choice(list("ACGT"), 12))
                f1.write(f"@c{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
                f2.write(f"@c{n}\n{'T' * 10}{AB_SEQS[g]}{'A' * 46}\n+\n"
                         f"{'F' * 71}\n")
                n += 1
            # ambient cross-contamination of the other guide
            umi = "".join(rng.choice(list("ACGT"), 12))
            f1.write(f"@c{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
            f2.write(f"@c{n}\n{'T' * 10}{AB_SEQS[1 - g]}{'A' * 46}\n+\n"
                     f"{'F' * 71}\n")
            n += 1
    out = str(tmp_path / "out")
    summary = run_count(CountConfig(
        fastq_pairs=[], reference_path=s["ref"], whitelist_path=s["wl"],
        feature_ref_csv=str(fcsv),
        libraries=[LibraryDef([(s["r1"], s["r2"])], "Gene Expression"),
                   LibraryDef([(r1p, r2p)], "CRISPR Guide Capture")],
        chemistry="SC3Pv3", read_len=91, batch_size=2048,
        secondary_analysis=False), out)
    path = os.path.join(out, "crispr_analysis",
                        "protospacer_calls_per_cell.csv")
    rows = [r.split(",") for r in open(path).read().splitlines()[1:]]
    calls = {r[0][:-2]: r[2] for r in rows}
    hits = sum(calls.get(bc) == g for bc, g in truth.items())
    assert hits >= 28, f"only {hits}/30 correct: {calls}"
    assert summary["cells_with_one_protospacer_frac"] >= 0.9
    assert os.path.exists(os.path.join(out, "crispr_analysis",
                                       "protospacer_calls_summary.csv"))


def test_multi_cmo_demux(synthetic_run, tmp_path):
    """multi config with GEX + Multiplexing Capture + [samples]: cells get
    demultiplexed into per-sample matrices via JIBES."""
    import shutil
    from cellranger_tpu.io.multi_config import run_multi
    s = synthetic_run
    rng = np.random.default_rng(71)
    CMO_SEQS = {"CMO301": "AAAACCCCGGGGTTT", "CMO302": "TTTTGGGGCCCCAAA"}
    fref = tmp_path / "cmo_features.csv"
    with open(fref, "w") as f:
        f.write("id,name,read,pattern,sequence,feature_type\n")
        for cid, seq in CMO_SEQS.items():
            f.write(f"{cid},{cid},R2,5PNNNNNNNNNN(BC),{seq},Multiplexing Capture\n")
    # CMO reads: cells 0..14 -> CMO301, 15..29 -> CMO302
    gdir = tmp_path / "gexfq"; cdir = tmp_path / "cmofq"
    os.makedirs(gdir); os.makedirs(cdir)
    shutil.copy(s["r1"], gdir / "gex_S1_L001_R1_001.fastq.gz")
    shutil.copy(s["r2"], gdir / "gex_S1_L001_R2_001.fastq.gz")
    n = 0
    with gzip.open(cdir / "cmo_S1_L001_R1_001.fastq.gz", "wt") as f1, \
         gzip.open(cdir / "cmo_S1_L001_R2_001.fastq.gz", "wt") as f2:
        for ci, bc in enumerate(s["cells"]):
            cmo = "CMO301" if ci < 15 else "CMO302"
            for u in range(25):
                umi = "".join(rng.choice(list("ACGT"), 12))
                f1.write(f"@c{n}\n{bc}{umi}\n+\n{'F' * 28}\n")
                f2.write(f"@c{n}\n{'T' * 10}{CMO_SEQS[cmo]}{'A' * 46}\n+\n{'F' * 71}\n")
                n += 1
    mcsv = tmp_path / "multi.csv"
    with open(mcsv, "w") as f:
        f.write(f"""[gene-expression]
reference,{s['ref']}
chemistry,SC3Pv3

[feature]
reference,{fref}

[libraries]
fastq_id,fastqs,feature_types
gex,{gdir},Gene Expression
cmo,{cdir},Multiplexing Capture

[samples]
sample_id,cmo_ids
sampleA,CMO301
sampleB,CMO302
""")
    out = str(tmp_path / "mout")
    summary = run_multi(str(mcsv), out, s["wl"], read_len=91, batch_size=2048)
    d = summary["demux"]
    assert set(d["samples"]) == {"sampleA", "sampleB"}
    # most cells assigned to the right sample (JIBES on clean data)
    assert d["samples"]["sampleA"] >= 13
    assert d["samples"]["sampleB"] >= 13
    from cellranger_tpu.io.matrix_io import CountMatrix
    sub = CountMatrix.load_h5(os.path.join(
        out, "demux", "per_sample_outs", "sampleA",
        "sample_filtered_feature_bc_matrix.h5"))
    called = {b.decode()[:-2] for b in sub.barcodes}
    assert called <= set(s["cells"][:15])
    rows = open(os.path.join(out, "demux", "assignments.csv")).read().splitlines()
    assert rows[0] == "barcode,tag_call,sample,posterior"
    # per-sample outs: MEX + metrics + web summary (SAMPLE_REPORTER analog)
    import json
    sdir = os.path.join(out, "demux", "per_sample_outs", "sampleA")
    assert os.path.exists(os.path.join(
        sdir, "sample_filtered_feature_bc_matrix", "matrix.mtx.gz"))
    sm = json.load(open(os.path.join(sdir, "metrics_summary.json")))
    assert sm["cells"] == d["samples"]["sampleA"]
    assert sm["median_umis_per_cell"] > 0
    # top-level combined multi summary + web summary
    top = json.load(open(os.path.join(out, "metrics_summary.json")))
    assert top["cells_sampleA"] == d["samples"]["sampleA"]
    assert top["estimated_cells"] >= 30
    assert os.path.exists(os.path.join(out, "web_summary.html"))


def test_per_sample_molecule_info(synthetic_run, tmp_path):
    """Per-sample molecule_info (MULTI_WRITE_PER_SAMPLE_MOLECULE_INFO,
    _basic_sc_rna_counter.mro:277-294): demux writes a subset h5 whose
    molecules all belong to the sample's barcodes."""
    from cellranger_tpu.io.molecule_info import (load_molecule_info,
                                                 subset_molecule_info)
    from cellranger_tpu.pipeline.count import CountConfig, run_count
    s = synthetic_run
    out = str(tmp_path / "out")
    run_count(CountConfig(
        fastq_pairs=[(s["r1"], s["r2"])], reference_path=s["ref"],
        whitelist_path=s["wl"], chemistry="SC3Pv3", read_len=91,
        batch_size=2048, secondary_analysis=False, checkpoint=False), out)
    src = os.path.join(out, "molecule_info.h5")
    mi = load_molecule_info(src)
    keep = [s["cells"][i].encode() for i in range(10)]
    dst = str(tmp_path / "sample_molecule_info.h5")
    n = subset_molecule_info(src, dst, keep)
    sub = load_molecule_info(dst)
    assert len(sub["barcode_idx"]) == n > 0
    keep_set = {k for k in keep}
    got = {sub["barcodes"][int(b)].split(b"-")[0]
           for b in sub["barcode_idx"]}
    assert got <= keep_set
    assert n < len(mi["barcode_idx"])
    # library_info and features survive the subset
    assert sub["library_info"] == mi["library_info"]
    assert np.array_equal(sub["features_id"], mi["features_id"])
