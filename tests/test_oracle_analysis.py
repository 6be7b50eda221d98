"""Live-oracle conformance for the analysis layers (VERDICT r4 item 6):
run the REFERENCE pipeline's own runnable Python — diffexp size factors +
BH adjust (analysis/diffexp.py), sklearn-backed kmeans (analysis/
kmeans.py), and the JIBES EM (analysis/jibes_py.py, with its single
statsmodels WLS call backed by an exact numpy WLS stub) — against this
engine's re-implementations on shared inputs.

The sseq NB test core itself is NOT runnable Python in this reference
tree (compute_sseq_params_o3 / sseq_differential_expression_o3 are PyO3
exports of lib/rust/fast_utils — no cargo in this image), so sseq parity
remains covered by the dict-spec tests in test_analysis.py; here we pin
the runnable boundary layers exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as sp

from oracle_ref import load_oracle

ORACLE = load_oracle()
pytestmark = pytest.mark.skipif(ORACLE is None,
                                reason="reference tree not available")


def _counts(seed=0, genes=120, cells=300):
    rng = np.random.RandomState(seed)
    base = rng.gamma(2.0, 2.0, size=(genes, 1))
    depth = rng.lognormal(0, 0.5, size=(1, cells))
    return sp.csc_matrix(rng.poisson(base * depth).astype(np.int64))


def test_diffexp_size_factors_parity():
    from cellranger_tpu.analysis.diffexp import estimate_size_factors
    x = _counts()
    ours = estimate_size_factors(x)
    ref = ORACLE.diffexp.estimate_size_factors(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_diffexp_bh_adjust_parity():
    from cellranger_tpu.analysis.diffexp import adjust_pvalue_bh
    rng = np.random.RandomState(3)
    p = rng.uniform(size=500)
    p[rng.choice(500, 40, replace=False)] *= 1e-4
    np.testing.assert_allclose(adjust_pvalue_bh(p),
                               ORACLE.diffexp.adjust_pvalue_bh(p),
                               rtol=1e-12)


def _relabel_by_size(labels):
    """1-based labels -> relabeled so cluster 1 is the biggest (the
    reference's cr_clustering.relabel_by_size semantics)."""
    ids, counts = np.unique(labels, return_counts=True)
    order = ids[np.argsort(-counts, kind="stable")]
    remap = {old: new + 1 for new, old in enumerate(order)}
    return np.array([remap[v] for v in labels])


def test_kmeans_decision_parity():
    """Well-separated blobs with distinct sizes: our jax Lloyd kmeans and
    the reference's sklearn kmeans must produce the same partition after
    relabel-by-size."""
    from cellranger_tpu.analysis.kmeans import run_kmeans
    rng = np.random.RandomState(11)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 9.0]])
    sizes = [220, 140, 60]
    pts = np.concatenate([
        c + 0.4 * rng.standard_normal((s, 2))
        for c, s in zip(centers, sizes)])
    perm = rng.permutation(len(pts))
    pts = pts[perm]

    ref_clu = ORACLE.kmeans.run_kmeans(pts, 3, random_state=0)
    ref_labels = np.asarray(ref_clu.clusters)

    ours, _, _ = run_kmeans(pts, 3, seed=0)
    np.testing.assert_array_equal(_relabel_by_size(ours),
                                  _relabel_by_size(ref_labels))


def _jibes_sim(seed=5, n_cells=900, tags=4):
    np.random.seed(seed)
    ref = ORACLE.jibes_py
    model = ref.JibesModelPy([0.6] * tags, [2.2] * tags, [0.25] * tags)
    data, x_true = model.simulate(n_cells)
    return ref, model, data, x_true


def _ref_assignments(fitter, tags):
    state = np.asarray(fitter.posterior).argmax(axis=1)
    ls = np.asarray(fitter.latent_states)
    klet = ls.sum(axis=1).astype(int)[state]
    out = []
    for s, k in zip(state, klet):
        if k == 0:
            out.append("Blank")
        elif k == 1:
            out.append("ABCDEFGH"[int(np.argmax(ls[s]))])
        else:
            out.append("Multiplet")
    return np.array(out)


def test_jibes_em_parity():
    """Reference JibesEMPy vs our fit_jibes on data simulated from the
    reference's own model: fitted foreground/background must recover the
    simulation truth on both sides, and per-cell calls must agree."""
    from cellranger_tpu.analysis.jibes import fit_jibes
    ref, model, data, x_true = _jibes_sim()
    tags = model.num_tags

    fitter = ref.JibesEMPy(data, model)
    fitter.perform_EM()
    assert fitter.converged
    ref_fg = np.asarray(fitter.model.foreground, float)
    ref_bg = np.asarray(fitter.model.background, float)
    np.testing.assert_allclose(ref_fg, 2.2, rtol=0.15)

    counts = np.maximum(10.0 ** np.asarray(data.counts) - 1.0, 0.0)
    ours = fit_jibes(counts, list("ABCDEFGH"[:tags]))
    np.testing.assert_allclose(ours.foreground, ref_fg, rtol=0.15)
    np.testing.assert_allclose(ours.background, ref_bg, atol=0.25)

    ra = _ref_assignments(fitter, tags)
    oa = np.array(ours.assignments)
    agree = float((ra == oa).mean())
    assert agree >= 0.95, f"assignment agreement {agree:.3f}"
