"""Sharded kmer table (BASELINE config 4): the all_to_all seed-query
exchange must be byte-identical to the local replicated-table lookup, at
the lookup level, the aligner level, and through the production run_count.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cellranger_tpu.ops.bucket_table import BucketTable
from cellranger_tpu.parallel.index_shard import (
    shard_device_index, sharded_kmer_lookup, strip_pad_row)
from cellranger_tpu.parallel.mesh import make_mesh

READ_LEN = 91


def test_sharded_lookup_matches_local():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 32, 4000, dtype=np.uint64).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, 4000, dtype=np.uint64).astype(np.uint32)
    t = BucketTable.build(keys, vals, entries=8, fields=2)
    B, S = 64 * 8, 7
    q = np.concatenate([
        np.tile(keys, -(-B * S // (2 * len(keys))))[:B * S // 2],
        rng.integers(0, 1 << 32, B * S - B * S // 2,
                     dtype=np.uint64).astype(np.uint32)])
    rng.shuffle(q)
    q = np.ascontiguousarray(q.reshape(B, S))
    hit0, val0 = t.lookup(jnp.asarray(q))

    mesh = make_mesh(8)
    ts = strip_pad_row(t)
    rows_sh = jax.device_put(np.asarray(ts.rows),
                             NamedSharding(mesh, P("data")))
    q_sh = jax.device_put(q, NamedSharding(mesh, P("data")))

    def local(rows, ql):
        tl = BucketTable(rows=rows, bits=ts.bits, entries=ts.entries,
                         fields=ts.fields, probe_rows=1)
        hit, val, ov = sharded_kmer_lookup(tl, ql, "data")
        return hit, val, ov[None]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")), check_vma=False))
    hit1, val1, ov = fn(rows_sh, q_sh)
    assert int(np.asarray(ov).sum()) == 0
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(
        np.where(np.asarray(hit0), np.asarray(val0), 0),
        np.where(np.asarray(hit1), np.asarray(val1), 0))


def _small_index(seed=7, genome_len=30_000):
    from cellranger_tpu.align.aligner import DeviceIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, genome_len).astype(np.uint8)
    genome = bases[genome_codes].tobytes()
    txome = Transcriptome(
        genes=[Gene("G1", "G1", "chr1", "+", 0)],
        transcripts=[Transcript("T1", 0, "chr1", "+",
                                [(1000, 1900), (2500, 3400)])])
    gi = GenomeIndex.build({"chr1": genome}, txome)
    return DeviceIndex.from_host(gi), genome_codes, rng


def test_sharded_aligner_byte_identical():
    from cellranger_tpu.align.aligner import make_aligner
    didx, genome_codes, rng = _small_index()
    B = 64 * 8
    pos = rng.integers(0, len(genome_codes) - READ_LEN, B)
    rna = genome_codes[pos[:, None] + np.arange(READ_LEN)[None, :]]
    nmask = np.ones((B, READ_LEN), bool)

    out0 = make_aligner(didx, READ_LEN)(jnp.asarray(rna),
                                        jnp.asarray(nmask))
    out0 = jax.tree.map(np.asarray, out0)

    mesh = make_mesh(8)
    didx_sh, spec = shard_device_index(didx, mesh)
    impl = make_aligner(didx_sh, READ_LEN, bind=False, shard_axis="data")
    fn = jax.jit(jax.shard_map(
        impl, mesh=mesh, in_specs=(spec, P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    rna_sh = jax.device_put(np.asarray(rna),
                            NamedSharding(mesh, P("data")))
    nm_sh = jax.device_put(nmask, NamedSharding(mesh, P("data")))
    out1 = jax.tree.map(np.asarray, fn(didx_sh, rna_sh, nm_sh))

    assert set(out0) == set(out1)
    for k in sorted(out0):
        np.testing.assert_array_equal(out0[k], out1[k], err_msg=k)


def test_shard_index_run_count_byte_identical(tmp_path):
    """PRODUCTION: run_count with shard_index=True over an 8-device mesh
    == the single-chip run, byte for byte (matrix + molecule_info)."""
    import __graft_entry__ as ge
    from cellranger_tpu.io.matrix_io import CountMatrix
    from cellranger_tpu.io.molecule_info import load_molecule_info
    from cellranger_tpu.pipeline.count import CountConfig, run_count

    fx = ge._tiny_run_fixture(str(tmp_path))
    base = dict(fastq_pairs=[(fx["r1"], fx["r2"])],
                reference_path=fx["ref"], whitelist_path=fx["wl"],
                chemistry="SC3Pv3", read_len=91, batch_size=128,
                secondary_analysis=False, checkpoint=False)
    out1 = str(tmp_path / "single")
    out2 = str(tmp_path / "shard8")
    sum1 = run_count(CountConfig(**base), out1)
    sum2 = run_count(CountConfig(**base, shard_index=True), out2,
                     mesh=make_mesh(8))
    for k, v in sum1.items():
        if k in ("wall_time_s",):
            continue
        assert sum2[k] == v, f"summary[{k}]: {sum2[k]} != {v}"
    m1 = CountMatrix.load_h5(os.path.join(out1, "raw_feature_bc_matrix.h5"))
    m2 = CountMatrix.load_h5(os.path.join(out2, "raw_feature_bc_matrix.h5"))
    assert (m1.m != m2.m).nnz == 0
    mi1 = load_molecule_info(os.path.join(out1, "molecule_info.h5"))
    mi2 = load_molecule_info(os.path.join(out2, "molecule_info.h5"))
    for k in ("barcode_idx", "feature_idx", "umi", "count"):
        np.testing.assert_array_equal(mi1[k], mi2[k], err_msg=k)
