"""Open-addressing hash table: build/lookup incl. duplicates + collisions."""

import numpy as np
import jax.numpy as jnp

from cellranger_tpu.ops.hash_index import EMPTY, HashTable, PROBE


def test_roundtrip_unique():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**32 - 1, 5000, dtype=np.uint64)
                     .astype(np.uint32))
    vals = np.arange(len(keys), dtype=np.uint32)
    t = HashTable.build(keys, vals)
    hit, idx = t.membership(jnp.asarray(keys))
    assert bool(hit.all())
    np.testing.assert_array_equal(np.asarray(idx), vals)
    # misses
    miss = (keys[:100].astype(np.int64) + 1).astype(np.uint32)
    miss = miss[~np.isin(miss, keys)]
    h2, i2 = t.membership(jnp.asarray(miss))
    assert not bool(h2.any())
    assert (np.asarray(i2) == -1).all()


def test_duplicate_keys_surface_multiple_vals():
    keys = np.asarray([7, 7, 7, 9, 9, 1000], np.uint32)
    vals = np.asarray([10, 11, 12, 20, 21, 30], np.uint32)
    t = HashTable.build(keys, vals, load=0.25)
    hits, vv = t.lookup(jnp.asarray(np.asarray([7, 9, 1000, 8], np.uint32)))
    hits = np.asarray(hits); vv = np.asarray(vv)
    assert set(vv[0][hits[0]]) == {10, 11, 12}
    assert set(vv[1][hits[1]]) == {20, 21}
    assert set(vv[2][hits[2]]) == {30}
    assert not hits[3].any()


def test_high_load_collisions_still_found():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 20, 3000, dtype=np.uint64)
                     .astype(np.uint32))  # clustered low keys stress buckets
    vals = np.arange(len(keys), dtype=np.uint32)
    t = HashTable.build(keys, vals, load=0.9)
    hit, idx = t.membership(jnp.asarray(keys), probe=PROBE)
    # high load + small probe window may drop a few; must stay tiny
    assert float(np.asarray(hit).mean()) > 0.97


def test_empty_key_dropped():
    keys = np.asarray([EMPTY, 5], np.uint32)
    vals = np.asarray([1, 2], np.uint32)
    t = HashTable.build(keys, vals)
    hit, _ = t.membership(jnp.asarray(np.asarray([5], np.uint32)))
    assert bool(hit[0])
    h2, _ = t.membership(jnp.asarray(np.asarray([EMPTY], np.uint32)))
    assert not bool(h2[0])


def test_empty_table():
    t = HashTable.build(np.zeros(0, np.uint32), np.zeros(0, np.uint32))
    hit, idx = t.membership(jnp.asarray(np.asarray([1, 2], np.uint32)))
    assert not bool(hit.any())
