"""Metric algebra: monoid merge semantics (metric/src/lib.rs:197)."""

import numpy as np

from cellranger_tpu.metrics import (CountMetric, MeanMetric, PercentMetric,
                                    SimpleHistogram, merge_metrics,
                                    report_metrics)


def test_count_and_percent_merge():
    a, b = CountMetric(3), CountMetric(4)
    assert a.merge(b).report() == 7
    p, q = PercentMetric(1, 4), PercentMetric(3, 4)
    assert p.merge(q).report() == 0.5


def test_mean_exact_under_merge():
    a, b = MeanMetric(), MeanMetric()
    xs = np.arange(10.0)
    for x in xs[:6]:
        a.record(x)
    for x in xs[6:]:
        b.record(x)
    assert a.merge(b).report() == xs.mean()


def test_histogram_merge_associative():
    rng = np.random.default_rng(0)
    ks = rng.integers(0, 20, 1000)
    h1, h2, h3 = SimpleHistogram(), SimpleHistogram(), SimpleHistogram()
    h1.observe_array(ks[:300])
    h2.observe_array(ks[300:700])
    h3.observe_array(ks[700:])
    left = SimpleHistogram()
    left.merge(h1).merge(h2).merge(h3)
    ref = {int(k): int(c) for k, c in
           zip(*np.unique(ks, return_counts=True))}
    assert left.report() == ref
    assert left.total() == 1000
    assert left.quantile(0.0) == ks.min()
    assert left.quantile(1.0) == ks.max()
    med = left.quantile(0.5)
    assert abs(int(med) - int(np.median(ks))) <= 1


def test_struct_merge_and_report():
    m1 = dict(reads=CountMetric(10), frac=PercentMetric(5, 10),
              hist=SimpleHistogram({1: 2}), n=7)
    m2 = dict(reads=CountMetric(5), frac=PercentMetric(5, 10),
              hist=SimpleHistogram({1: 1, 2: 3}), n=3)
    merged = merge_metrics(m1, m2)
    rep = report_metrics(merged)
    assert rep["reads"] == 15
    assert rep["frac"] == 0.5
    assert rep["hist"] == {1: 3, 2: 3}
    assert rep["n"] == 10


def test_subsample_metrics():
    from cellranger_tpu.analysis.subsample import subsample_metrics
    rng = np.random.default_rng(1)
    n = 5000
    mol_bc = rng.integers(0, 50, n)
    mol_gene = rng.integers(0, 30, n)
    mol_reads = rng.integers(1, 6, n)
    cells = np.arange(40)
    out = subsample_metrics(mol_bc, mol_gene, mol_reads, cells)
    full = out["curves"][1.0]
    assert full["subsampled_reads"] == mol_reads.sum()
    assert abs(full["saturation"] - (1 - n / mol_reads.sum())) < 1e-9
    # saturation decreases with depth; reads increase monotonically
    rates = sorted(out["curves"])
    sats = [out["curves"][r]["saturation"] for r in rates]
    reads = [out["curves"][r]["subsampled_reads"] for r in rates]
    assert all(a <= b + 0.03 for a, b in zip(sats, sats[1:]))
    assert all(a <= b for a, b in zip(reads, reads[1:]))
    # deterministic under the pinned seed
    out2 = subsample_metrics(mol_bc, mol_gene, mol_reads, cells)
    assert out2["curves"][0.5] == out["curves"][0.5]
