"""stats crate analogs: NX and reservoir sampling
(lib/rust/stats/src/nx.rs, reservoir_sampling.rs)."""

import numpy as np
import pytest

from cellranger_tpu.stats import n50, nx, reservoir_sample


def test_n50_basic():
    # total 100; sorted desc 40,30,20,10; cumsum 40,70,... -> 50% at 30
    assert n50([10, 20, 30, 40]) == 30
    assert n50([5]) == 5
    assert n50([]) == 0
    assert n50([0, 0]) == 0
    # equal pieces: N50 is the piece length
    assert n50([7] * 9) == 7


def test_nx_quantiles():
    lens = [10, 20, 30, 40]
    assert nx(lens, 0.25) == 40      # 40 alone covers 40% >= 25%
    assert nx(lens, 0.9) == 20       # 40+30+20=90 covers 90%
    assert nx(lens, 1.0) == 10
    with pytest.raises(ValueError):
        nx(lens, 0.0)


def test_reservoir_sample_uniform_and_deterministic():
    s1 = reservoir_sample(range(1000), 10, seed=3)
    s2 = reservoir_sample(range(1000), 10, seed=3)
    assert s1 == s2 and len(s1) == 10
    assert reservoir_sample(range(5), 10) == [0, 1, 2, 3, 4]
    # roughly uniform: mean of many draws near the stream mean
    means = [np.mean(reservoir_sample(range(1000), 50, seed=s))
             for s in range(30)]
    assert 400 < np.mean(means) < 600
