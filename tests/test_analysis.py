"""Secondary analysis: PCA/kmeans/graphclust separate two synthetic
populations; diffexp finds the discriminating genes; embeddings write out."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from cellranger_tpu.analysis.pca import run_pca
from cellranger_tpu.analysis.kmeans import run_kmeans
from cellranger_tpu.analysis.graphclust import run_graph_clustering, louvain
from cellranger_tpu.analysis.diffexp import (
    compute_sseq_params, run_differential_expression)
from cellranger_tpu.analysis.preprocess import log_normalize_dense, select_features
from cellranger_tpu.analysis.run import run_secondary_analysis
from cellranger_tpu.analysis.sgt import sgt_proportions
from cellranger_tpu.io.matrix_io import CountMatrix, FeatureDef, FeatureReference


@pytest.fixture(scope="module")
def two_pop_matrix():
    """200 cells x 100 genes; pop A (120 cells) expresses genes 0-9 high,
    pop B (80) genes 10-19 high; rest noise."""
    rng = np.random.default_rng(7)
    G, NA, NB = 100, 120, 80
    lam = np.full((G, NA + NB), 0.3)
    lam[0:10, :NA] = 8.0
    lam[10:20, NA:] = 8.0
    counts = rng.poisson(lam)
    m = sp.csc_matrix(counts.astype(np.int32))
    fref = FeatureReference([FeatureDef(f"g{i}", f"G{i}") for i in range(G)])
    bcs = [f"{'ACGT'[i % 4] * 14}{i:02d}".encode() for i in range(NA + NB)]
    truth = np.asarray([0] * NA + [1] * NB)
    return CountMatrix(m, bcs, fref), truth


def _cluster_agreement(labels, truth):
    """Best-case accuracy over label permutations (2 clusters)."""
    labels = np.asarray(labels)
    acc1 = (labels == labels[0]).astype(int)
    a = max(np.mean((acc1 == truth)), np.mean(acc1 != truth))
    return a


def test_pca_separates(two_pop_matrix):
    mat, truth = two_pop_matrix
    feats = select_features(mat.m)
    x = log_normalize_dense(mat.m, feats)
    pca = run_pca(x, 10)
    proj = pca["transformed_pca_matrix"]
    assert proj.shape == (200, 10)
    # PC1 should separate the populations almost perfectly
    pc1 = proj[:, 0]
    thr = (pc1[truth == 0].mean() + pc1[truth == 1].mean()) / 2
    side = pc1 > thr
    agree = max((side == truth).mean(), (side != truth).mean())
    assert agree > 0.95
    assert (np.diff(pca["variance_explained"]) <= 1e-6).all()


def test_kmeans_and_graphclust(two_pop_matrix):
    mat, truth = two_pop_matrix
    feats = select_features(mat.m)
    x = log_normalize_dense(mat.m, feats)
    proj = run_pca(x, 10)["transformed_pca_matrix"]
    labels, _, _ = run_kmeans(proj, 2)
    assert set(labels) == {1, 2}
    assert _cluster_agreement(labels, truth) > 0.95

    glabels = run_graph_clustering(proj)
    # graphclust may find >2 clusters, but the dominant split must align
    ari_ok = False
    for c in np.unique(glabels):
        sel = glabels == c
        frac_a = (truth[sel] == 0).mean()
        if frac_a > 0.9 or frac_a < 0.1:
            ari_ok = True
    assert ari_ok and len(np.unique(glabels)) >= 2


def test_louvain_two_cliques():
    # two 10-cliques joined by one edge -> two communities
    edges = []
    for base in (0, 10):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    src = np.asarray([e[0] for e in edges])
    dst = np.asarray([e[1] for e in edges])
    labels = louvain(src, dst, np.ones(len(edges)), 20)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_diffexp_finds_markers(two_pop_matrix):
    mat, truth = two_pop_matrix
    clusters = truth + 1
    res = run_differential_expression(mat.m, clusters)
    r1 = res[1]  # cluster of pop A
    # genes 0-9 should be strongly up in A with tiny p-values
    assert (r1["adjusted_p_value"][:10] < 1e-4).all()
    assert (r1["log2_fold_change"][:10] > 1).all()
    # noise genes mostly not significant
    assert (r1["adjusted_p_value"][25:] > 0.05).mean() > 0.9
    # symmetric for cluster 2
    r2 = res[2]
    assert (r2["adjusted_p_value"][10:20] < 1e-4).all()


def test_sseq_params_sane(two_pop_matrix):
    mat, _ = two_pop_matrix
    p = compute_sseq_params(mat.m)
    assert p["N"] == 200 and p["G"] == 100
    assert p["size_factors"].shape == (200,)
    assert 0 <= p["delta"] <= 1
    assert np.isfinite(p["phi_g"][p["use_g"]]).all()


def test_sgt_proportions():
    rng = np.random.default_rng(0)
    freqs = rng.poisson(3, 500) + 1
    pstar, p0 = sgt_proportions(freqs)
    assert np.isclose(pstar.sum() + p0, 1.0)
    assert (pstar > 0).all()


def test_full_analysis_outputs(two_pop_matrix, tmp_path):
    mat, truth = two_pop_matrix
    out = str(tmp_path / "analysis")
    res = run_secondary_analysis(mat, out, max_cells_tsne=300)
    for p in ["pca/10_components/projection.csv",
              "clustering/kmeans_2_clusters/clusters.csv",
              "clustering/graphclust/clusters.csv",
              "diffexp/graphclust/differential_expression.csv",
              "tsne/2_components/projection.csv",
              "umap/2_components/projection.csv"]:
        assert os.path.exists(os.path.join(out, p)), p
    ts = res["tsne"]
    # embedding separates populations: nearest-centroid accuracy
    ca = ts[truth == 0].mean(axis=0)
    cb = ts[truth == 1].mean(axis=0)
    d_a = np.linalg.norm(ts - ca, axis=1)
    d_b = np.linalg.norm(ts - cb, axis=1)
    pred = (d_b < d_a).astype(int)
    assert (pred == truth).mean() > 0.9


def test_hierarchical_clustering(two_pop_matrix):
    from cellranger_tpu.analysis.hclust import run_hierarchical_clustering
    mat, truth = two_pop_matrix
    hc = run_hierarchical_clustering(mat.m, truth + 1)
    assert sorted(hc["order"]) == [1, 2]
    assert len(hc["linkage"]) == 1
    # degenerate single cluster
    hc1 = run_hierarchical_clustering(mat.m, np.ones(mat.shape[1], int))
    assert hc1["order"] == [1]


def test_jibes_tag_assignment():
    from cellranger_tpu.analysis.jibes import fit_jibes
    rng = np.random.default_rng(17)
    T, per_tag = 3, 150
    rows = []
    truth = []
    # singlets: high counts on own tag, background on others
    for t in range(T):
        fg = rng.lognormal(5.5, 0.35, (per_tag, 1))
        bg = rng.lognormal(1.0, 0.5, (per_tag, T))
        y = bg.copy(); y[:, t:t+1] += fg
        rows.append(y); truth += [f"TAG{t}"] * per_tag
    # doublets tag0+tag1
    nd = 40
    bg = rng.lognormal(1.0, 0.5, (nd, T))
    bg[:, 0] += rng.lognormal(5.5, 0.35, nd)
    bg[:, 1] += rng.lognormal(5.5, 0.35, nd)
    rows.append(bg); truth += ["Multiplet"] * nd
    # blanks
    nb = 30
    rows.append(rng.lognormal(1.0, 0.5, (nb, T)))
    truth += ["Blank"] * nb
    counts = np.vstack(rows).astype(int)
    res = fit_jibes(counts, [f"TAG{t}" for t in range(T)])
    acc = np.mean([a == t for a, t in zip(res.assignments, truth)])
    assert acc > 0.9, f"accuracy {acc:.2f}"
    # parameters sensible: foreground >> 0, backgrounds small
    assert (res.foreground > 1.0).all()
    assert (res.background < 2.0).all()


def test_batch_correction_mnn():
    from cellranger_tpu.analysis.batch_correction import correct_batches
    rng = np.random.default_rng(5)
    # two populations, two batches; batch 2 shifted by a constant vector
    popA = rng.normal(0, 1, (120, 10))
    popB = rng.normal(0, 1, (120, 10)); popB[:, 0] += 8
    batch1 = np.vstack([popA[:60], popB[:60]])
    shift = np.full(10, 5.0); shift[1] = 7.0
    batch2 = np.vstack([popA[60:], popB[60:]]) + shift
    proj = np.vstack([batch1, batch2])
    batches = np.asarray(["b1"] * 120 + ["b2"] * 120)
    pops = np.asarray([0]*60 + [1]*60 + [0]*60 + [1]*60)

    def mixing(p):
        # average fraction of same-batch cells among 10 NN (lower = better mixed)
        from cellranger_tpu.analysis.graphclust import knn_graph
        import jax.numpy as jnp
        idx, _ = knn_graph(jnp.asarray(p, jnp.float32), 10)
        idx = np.asarray(idx)
        same = (batches[idx] == batches[:, None]).mean()
        return float(same)

    before = mixing(proj)
    corrected = correct_batches(proj, batches)
    after = mixing(corrected)
    assert before > 0.95          # batches fully separated before
    assert after < 0.75           # well mixed after
    # populations must remain separated after correction
    ca = corrected[pops == 0].mean(0); cb = corrected[pops == 1].mean(0)
    assert np.linalg.norm(ca - cb) > 4
