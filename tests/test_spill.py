"""Spill machinery: partitioned molecule spill, vectorized triple join,
multi-host work sharding and partition union."""

import numpy as np

from cellranger_tpu.pipeline.spill import MoleculeSpill, lex3_join_np
from cellranger_tpu.parallel.distributed import host_shard


def test_molecule_spill_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    sp = MoleculeSpill(str(tmp_path / "sp"), n_parts=4)
    all_rows = []
    for _ in range(5):
        bc = rng.integers(0, 1000, 257).astype(np.uint32)
        gene = rng.integers(0, 50, 257).astype(np.uint32)
        umi = rng.integers(0, 1 << 24, 257).astype(np.uint32)
        sp.append(bc, gene, umi)
        all_rows.append(np.column_stack([bc, gene, umi]))
    expect = np.concatenate(all_rows)
    got = []
    for p in range(4):
        b, g, u = sp.load_part(p)
        assert (b % 4 == p).all(), "row in wrong partition"
        got.append(np.column_stack([b, g, u]))
    got = np.concatenate(got)
    # same multiset of rows
    key = lambda r: np.lexsort((r[:, 2], r[:, 1], r[:, 0]))
    np.testing.assert_array_equal(expect[key(expect)], got[key(got)])
    assert sp.n_rows == len(expect)
    sp.close()


def test_spill_union_multihost(tmp_path):
    """Two hosts' spills union per partition with barcode coherence."""
    rows = {}
    for h in range(2):
        sp = MoleculeSpill(str(tmp_path / "sp"), n_parts=4,
                           prefix=f"host{h}_")
        bc = (np.arange(40, dtype=np.uint32) + h * 1000)
        sp.append(bc, bc % 7, bc * 3)
        sp.flush()
        rows[h] = bc
    total = 0
    for p in range(4):
        b, g, u = MoleculeSpill.load_union(str(tmp_path / "sp"), 4, p)
        assert (b % 4 == p).all()
        total += len(b)
    assert total == 80


def test_lex3_join():
    tb = np.asarray([1, 1, 2, 5], np.uint32)
    tg = np.asarray([0, 3, 1, 5], np.uint32)
    tu = np.asarray([7, 2, 9, 5], np.uint32)
    qb = np.asarray([1, 2, 1, 9, 5], np.uint32)
    qg = np.asarray([3, 1, 0, 9, 5], np.uint32)
    qu = np.asarray([2, 9, 8, 9, 5], np.uint32)
    idx, found = lex3_join_np(tb, tg, tu, qb, qg, qu)
    np.testing.assert_array_equal(found, [True, True, False, False, True])
    assert idx[0] == 1 and idx[1] == 2 and idx[4] == 3


def test_lex3_join_random():
    rng = np.random.default_rng(9)
    tb = rng.integers(0, 50, 200).astype(np.uint32)
    tg = rng.integers(0, 5, 200).astype(np.uint32)
    tu = rng.integers(0, 20, 200).astype(np.uint32)
    # dedupe table triples (join semantics assume distinct triples)
    uniq = np.unique(np.column_stack([tb, tg, tu]), axis=0)
    tb, tg, tu = uniq[:, 0], uniq[:, 1], uniq[:, 2]
    qb = rng.integers(0, 60, 500).astype(np.uint32)
    qg = rng.integers(0, 6, 500).astype(np.uint32)
    qu = rng.integers(0, 25, 500).astype(np.uint32)
    idx, found = lex3_join_np(tb, tg, tu, qb, qg, qu)
    tset = {(int(a), int(b), int(c)) for a, b, c in zip(tb, tg, tu)}
    for i in range(500):
        q = (int(qb[i]), int(qg[i]), int(qu[i]))
        assert found[i] == (q in tset)
        if found[i]:
            assert (int(tb[idx[i]]), int(tg[idx[i]]), int(tu[idx[i]])) == q


def test_host_shard_round_robin():
    items = list(range(10))
    shards = [host_shard(items, pid=k, nproc=3) for k in range(3)]
    assert shards[0] == [0, 3, 6, 9]
    assert shards[1] == [1, 4, 7]
    assert shards[2] == [2, 5, 8]
    assert sorted(sum(shards, [])) == items
