"""Conformance comparators + the e2e golden gate.

The comparators re-implement the reference's golden-output differ
(lib/rust/cr_lib/src/testing/correctness.rs:24-296); the golden gate runs
the deterministic tiny fixture through run_count and compares every output
class against the checked-in snapshot (tests/golden/e2e) — any output
format or tie-break regression fails here.  Regenerate goldens after an
INTENTIONAL change with `python tools/make_golden.py`.
"""

import gzip
import json
import os
import shutil

import numpy as np
import pytest

from cellranger_tpu.testing import correctness as cc

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e")


# ---------------------------------------------------------- unit: metrics
def test_metrics_tolerance_and_diffs():
    a = {"x": 1.0000000001, "n": 5, "s": "ok", "h": {"1": 2}}
    e = {"x": 1.0, "n": 5, "s": "ok", "h": {"1": 2}}
    assert cc.check_metrics(a, e) == []
    assert cc.check_metrics({**a, "n": 6}, e) != []
    assert cc.check_metrics({**a, "x": 1.01}, e) != []
    assert cc.check_metrics({**a, "s": "bad"}, e) != []
    assert cc.check_metrics({**a, "h": {"1": 3}}, e) != []
    # missing + unexpected keys
    assert any("missing" in d for d in cc.check_metrics({"n": 5}, e))
    assert any("unexpected" in d
               for d in cc.check_metrics({**a, "zz": 1}, e))
    # ignore list
    assert cc.check_metrics({**a, "wall_time_s": 99},
                            {**e, "wall_time_s": 1}) == []


def test_mtx_comparator(tmp_path):
    def write(path, lines):
        with gzip.open(path, "wt") as f:
            f.write("\n".join(lines) + "\n")
    a = str(tmp_path / "a.mtx.gz")
    b = str(tmp_path / "b.mtx.gz")
    write(a, ["%%MatrixMarket", '%metadata_json {"v": 1}', "1 2 3"])
    write(b, ["%%MatrixMarket", '%metadata_json {"v": 2}', "1 2 3"])
    assert cc.check_mtx(a, b) == []          # metadata payload ignored
    write(b, ["%%MatrixMarket", '%metadata_json {"v": 2}', "1 2 4"])
    assert cc.check_mtx(a, b) != []
    write(b, ["%%MatrixMarket", '%metadata_json {"v": 2}'])
    assert cc.check_mtx(a, b) != []          # unequal lengths


def test_h5_comparator(tmp_path):
    import h5py
    a, b = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    for path, val, attr in ((a, [1, 2, 3], "x"), (b, [1, 2, 3], "x")):
        with h5py.File(path, "w") as f:
            g = f.create_group("m")
            g.create_dataset("d", data=np.asarray(val))
            g.attrs["a"] = attr
    assert cc.check_h5(a, b) == []
    with h5py.File(b, "a") as f:
        f["m/d"][0] = 9
    assert cc.check_h5(a, b) != []
    with h5py.File(b, "a") as f:
        f["m/d"][0] = 1
        f["m"].attrs["a"] = "y"
    assert any("@a" in d for d in cc.check_h5(a, b))


# --------------------------------------------------------------- the gate
@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    import e2e_drive
    return e2e_drive.run(str(tmp_path_factory.mktemp("e2e")), dryrun=False)


def test_e2e_golden_gate(e2e_run):
    out = e2e_run["out_dir"]
    assert os.path.isdir(GOLDEN), \
        "golden snapshot missing; run tools/make_golden.py"
    cc.assert_metrics(os.path.join(out, "metrics_summary.json"),
                      os.path.join(GOLDEN, "metrics_summary.json"))
    cc.assert_mtx(os.path.join(out, "raw_feature_bc_matrix/matrix.mtx.gz"),
                  os.path.join(GOLDEN, "raw_feature_bc_matrix/matrix.mtx.gz"))
    for f in ("barcodes.tsv.gz", "features.tsv.gz"):
        cc.assert_mtx(os.path.join(out, "raw_feature_bc_matrix", f),
                      os.path.join(GOLDEN, "raw_feature_bc_matrix", f))
    cc.assert_h5(os.path.join(out, "filtered_feature_bc_matrix.h5"),
                 os.path.join(GOLDEN, "filtered_feature_bc_matrix.h5"))
    cc.assert_molecule_info(os.path.join(out, "molecule_info.h5"),
                            os.path.join(GOLDEN, "molecule_info.h5"))
    cc.assert_bam(os.path.join(out, "possorted_genome_bam.bam"),
                  os.path.join(GOLDEN, "possorted_genome_bam.bam"))
    for f in ("filtered_barcodes.csv", "junctions.tsv"):
        with open(os.path.join(out, f)) as fa, \
                open(os.path.join(GOLDEN, f)) as fe:
            assert fa.read() == fe.read(), f"{f} differs from golden"


def test_bam_comparator_catches_mutations(e2e_run, tmp_path):
    """Sanity of the BAM differ itself: a perturbed copy must fail."""
    out = e2e_run["out_dir"]
    bam = os.path.join(out, "possorted_genome_bam.bam")
    assert cc.check_bam(bam, bam) == []
    # corrupt one record's MAPQ by rewriting a copy through the reader
    from cellranger_tpu.io.bam_read import read_bam
    from cellranger_tpu.io.bam import BamWriter, FLAG_UNMAPPED
    refs, recs, _ = read_bam(bam)
    mut = str(tmp_path / "mut.bam")
    w = BamWriter(mut, [r[0] for r in refs], [r[1] for r in refs])
    for i, r in enumerate(recs):
        mapq = 3 if (i == 0 and r["mapq"] == 255) else r["mapq"]
        if i == 1:
            r["tags"]["UB"] = "A" * 12
        cig = [(n, "MIDNSHP=X".index(op)) for n, op in r["cigar"]]
        w.write_record(r["name"].encode(), r["flag"], r["ref_id"], r["pos"],
                       mapq, cig, r["seq"].encode().replace(b"=", b"N"),
                       bytes(r["qual"]),
                       [(k, "i" if isinstance(v, int) else
                         ("A" if len(str(v)) == 1 and k == "RE" else "Z"),
                         v.encode() if isinstance(v, str) else v)
                        for k, v in r["tags"].items()])
    w.close()
    diffs = cc.check_bam(mut, bam)
    assert any("mapq" in d for d in diffs) or any("UB" in d for d in diffs)


# ------------------------------------------------- the rich golden gate
GOLDEN_RICH = os.path.join(os.path.dirname(__file__), "golden", "e2e_rich")


@pytest.fixture(scope="module")
def e2e_rich_run(tmp_path_factory):
    import e2e_drive
    return e2e_drive.run_rich(str(tmp_path_factory.mktemp("e2e_rich")))


def test_e2e_rich_golden_gate(e2e_rich_run):
    """Golden gate over the ENGINEERED fixture (VERDICT r4 item 10):
    multimapper families + secondary records, an unannotated splice
    junction, TSO/polyA edges, UMI 1-off shadows, and a dual
    (GEX + Antibody) library run — the regression classes the tiny
    fixture cannot reach."""
    out = e2e_rich_run["out_dir"]
    assert os.path.isdir(GOLDEN_RICH), \
        "rich golden snapshot missing; run tools/make_golden.py"
    cc.assert_metrics(os.path.join(out, "metrics_summary.json"),
                      os.path.join(GOLDEN_RICH, "metrics_summary.json"))
    cc.assert_mtx(os.path.join(out, "raw_feature_bc_matrix/matrix.mtx.gz"),
                  os.path.join(GOLDEN_RICH,
                               "raw_feature_bc_matrix/matrix.mtx.gz"))
    for f in ("barcodes.tsv.gz", "features.tsv.gz"):
        cc.assert_mtx(os.path.join(out, "raw_feature_bc_matrix", f),
                      os.path.join(GOLDEN_RICH, "raw_feature_bc_matrix", f))
    cc.assert_h5(os.path.join(out, "filtered_feature_bc_matrix.h5"),
                 os.path.join(GOLDEN_RICH, "filtered_feature_bc_matrix.h5"))
    cc.assert_molecule_info(os.path.join(out, "molecule_info.h5"),
                            os.path.join(GOLDEN_RICH, "molecule_info.h5"))
    cc.assert_bam(os.path.join(out, "possorted_genome_bam.bam"),
                  os.path.join(GOLDEN_RICH, "possorted_genome_bam.bam"))
    for f in ("filtered_barcodes.csv", "junctions.tsv"):
        with open(os.path.join(out, f)) as fa, \
                open(os.path.join(GOLDEN_RICH, f)) as fe:
            assert fa.read() == fe.read(), f"{f} differs from golden"


def test_rich_run_engineered_invariants(e2e_rich_run):
    """Structural invariants of the rich run, independent of goldens:
    novel junctions discovered, secondary records present, both feature
    types counted."""
    out = e2e_rich_run["out_dir"]
    with open(os.path.join(out, "junctions.tsv")) as f:
        rows = [ln.split("\t") for ln in f.read().strip().splitlines()[1:]]
    novel = [r for r in rows if r[5] == "0"]   # annotated column
    assert novel, "no novel junctions discovered"
    # the engineered junction: intron 150101..151000 (1-based inclusive)
    assert any(int(r[1]) == 150_101 and int(r[2]) == 151_000
               for r in novel), novel[:5]
    from cellranger_tpu.io.bam_read import read_bam
    _, recs, _ = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    assert any(r["flag"] & 256 for r in recs), "no secondary records"
    assert any("N" in "".join(op for _, op in r["cigar"]) for r in recs), \
        "no spliced CIGARs"
    from cellranger_tpu.io.matrix_io import CountMatrix
    raw = CountMatrix.load_h5(
        os.path.join(out, "raw_feature_bc_matrix.h5"))
    types = {d.feature_type for d in raw.features.feature_defs}
    assert types == {"Gene Expression", "Antibody Capture"}
