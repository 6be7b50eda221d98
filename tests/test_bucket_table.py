"""BucketTable: one-row-gather hash table used by the seed index and
whitelist correction."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.ops.bucket_table import EMPTY, BucketTable


def test_unique_keys_roundtrip():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**32 - 1, 5000, np.uint64).astype(np.uint32))
    vals = np.arange(len(keys), dtype=np.uint32)
    t = BucketTable.build_exact(keys, vals, entries=8, fields=3)
    hit, v = t.membership(jnp.asarray(keys))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(v), vals)
    # misses
    miss = rng.integers(0, 2**32 - 1, 1000, np.uint64).astype(np.uint32)
    miss = miss[~np.isin(miss, keys)]
    hit, v = t.membership(jnp.asarray(miss))
    assert not bool(np.asarray(hit).any())
    assert (np.asarray(v) == -1).all()


def test_duplicate_keys_surface_up_to_entries():
    keys = np.asarray([7, 7, 7, 9, 9, 1234567] * 1, np.uint32)
    vals = np.asarray([10, 11, 12, 20, 21, 30], np.uint32)
    t = BucketTable.build(keys, vals, entries=8)
    hit, v = t.lookup(jnp.asarray(np.asarray([7, 9, 1234567, 42], np.uint32)))
    hit = np.asarray(hit)
    v = np.asarray(v)
    assert sorted(v[0][hit[0]].tolist()) == [10, 11, 12]
    assert sorted(v[1][hit[1]].tolist()) == [20, 21]
    assert v[2][hit[2]].tolist() == [30]
    assert hit[3].sum() == 0


def test_overflow_drops_gracefully():
    # 20 duplicates of one key, only `entries` survive
    keys = np.full(20, 99, np.uint32)
    vals = np.arange(20, dtype=np.uint32)
    t = BucketTable.build(keys, vals, entries=4, probe_rows=1)
    hit, v = t.lookup(jnp.asarray(np.asarray([99], np.uint32)))
    assert np.asarray(hit).sum() == 4


def test_probe_rows_spill():
    # force tiny table so buckets collide; exact build must still find all
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 2**32 - 1, 2000, np.uint64).astype(np.uint32))
    vals = np.arange(len(keys), dtype=np.uint32)
    t = BucketTable.build_exact(keys, vals, entries=4, fields=2)
    hit, v = t.membership(jnp.asarray(keys))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(v), vals)


def test_with_counts():
    keys = np.asarray([5, 17, 999], np.uint32)
    vals = np.asarray([0, 1, 2], np.uint32)
    t = BucketTable.build_exact(keys, vals, entries=4, fields=3)
    counts = np.asarray([100, 200, 300], np.int64)
    t2 = t.with_counts(counts)
    hit, v, c = t2.membership3(jnp.asarray(keys))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(v), vals)
    np.testing.assert_array_equal(np.asarray(c), counts)
    # miss -> count 0
    hit, v, c = t2.membership3(jnp.asarray(np.asarray([12345], np.uint32)))
    assert not bool(np.asarray(hit).any()) and int(c[0]) == 0


def test_empty_key_never_matches():
    keys = np.asarray([1, 2, 3], np.uint32)
    t = BucketTable.build(keys, keys)
    hit, _ = t.lookup(jnp.asarray(np.asarray([0xFFFFFFFF], np.uint64).astype(np.uint32)))
    assert np.asarray(hit).sum() == 0
