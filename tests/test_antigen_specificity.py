"""Antigen specificity (BEAM) scoring: beta-score semantics + multi-config
[antigen-specificity] parsing."""

import numpy as np
import scipy.sparse as sp
from scipy.stats import beta

from cellranger_tpu.analysis.feature_assigner import (ASSIGN_THRESHOLD,
                                                      antigen_specificity)
from cellranger_tpu.io.matrix_io import CountMatrix, FeatureDef, \
    FeatureReference
from cellranger_tpu.io.multi_config import MultiConfig


def _matrix():
    # features: 2 antigens (alleles A, B), 2 controls, 1 gene
    defs = [
        FeatureDef("G1", "G1", "Gene Expression"),
        FeatureDef("AG_A", "agA", "Antigen Capture",
                   tags={"mhc_allele": "A0201"}),
        FeatureDef("AG_B", "agB", "Antigen Capture",
                   tags={"mhc_allele": "B0702"}),
        FeatureDef("CTRL_A", "ctrlA", "Antigen Capture",
                   tags={"mhc_allele": "A0201"}),
        FeatureDef("CTRL_B", "ctrlB", "Antigen Capture",
                   tags={"mhc_allele": "B0702"}),
    ]
    #               cell0  cell1  cell2
    m = np.asarray([[5,     5,    5],     # gene
                    [200,   3,    0],     # AG_A: strong, weak, none
                    [0,     150,  0],     # AG_B
                    [2,     2,    0],     # CTRL_A
                    [1,     1,    0]])    # CTRL_B
    bcs = [b"AAAC-1", b"AAAG-1", b"AAAT-1"]
    return CountMatrix(sp.csc_matrix(m), bcs, FeatureReference(defs))


def test_specificity_scores_and_assignment(tmp_path):
    rows = [dict(control_id="CTRL_A", mhc_allele="A0201"),
            dict(control_id="CTRL_B", mhc_allele="B0702")]
    out = antigen_specificity(_matrix(), rows, str(tmp_path))
    assert out["antigen_specificity_n_antigens"] == 2
    assert out["antigen_specificity_cells_assigned"] == 2

    lines = open(tmp_path / "antigen_specificity_scores.csv").read() \
        .splitlines()
    header = lines[0].split(",")
    recs = {}
    for l in lines[1:]:
        d = dict(zip(header, l.split(",")))
        recs[(d["barcode"], d["antigen"])] = d
    # exact beta formula (specificity.py:606-614)
    expect = (1 - beta.cdf(0.925, 200 + 1, 2 + 3)) * 100
    assert abs(float(recs[("AAAC-1", "AG_A")]["score"]) - expect) < 1e-3
    assert recs[("AAAC-1", "AG_A")]["control"] == "CTRL_A"
    assert recs[("AAAC-1", "AG_B")]["control"] == "CTRL_B"
    assert float(recs[("AAAC-1", "AG_A")]["score"]) >= ASSIGN_THRESHOLD
    assert float(recs[("AAAG-1", "AG_A")]["score"]) < ASSIGN_THRESHOLD

    assigns = dict(l.split(",") for l in open(
        tmp_path / "antigen_assignment.csv").read().splitlines()[1:])
    assert assigns["AAAC-1"] == "AG_A"
    assert assigns["AAAG-1"] == "AG_B"
    assert assigns["AAAT-1"] == "Blank"


def test_multi_config_antigen_section(tmp_path):
    p = tmp_path / "multi.csv"
    p.write_text(
        "[gene-expression]\nreference,/ref\n"
        "[libraries]\nfastq_id,fastqs,feature_types\n"
        "s1,/fq,Gene Expression\n"
        "[antigen-specificity]\ncontrol_id,mhc_allele\n"
        "CTRL_A,A0201\nCTRL_B,B0702\n")
    cfg = MultiConfig.from_csv(str(p))
    assert cfg.antigen_specificity == [
        dict(control_id="CTRL_A", mhc_allele="A0201"),
        dict(control_id="CTRL_B", mhc_allele="B0702")]
