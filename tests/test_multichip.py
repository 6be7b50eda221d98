"""Sharded execution over the 8-virtual-device CPU mesh: the sharded step
must produce identical results to the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from cellranger_tpu.parallel.mesh import (
    make_mesh, make_sharded_step, make_sharded_bc_histogram, shard_batch_arrays)
from cellranger_tpu.ops import barcode as bcops


def test_entry_compiles():
    from cellranger_tpu.pipeline.count import unpack_step_out
    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    _, m = unpack_step_out(out)
    assert m["n_mapped"] > 0


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_sharded_equals_single():
    step, wl, genome, rng = ge._synthetic_setup()
    B = 64 * 8
    batch = ge._synthetic_batch(wl, genome, rng, B)
    from cellranger_tpu.ops.bucket_table import BucketTable
    wl_sorted = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3).with_counts(np.ones(wl.size, np.int64))
    args = (batch["bc_packed"], batch["bc_qual"], batch["bc_exact"],
            batch["umi_packed"], batch["umi_valid"], batch["rna"],
            batch["rna_nmask"], batch["slot_valid"], wl_sorted)
    from cellranger_tpu.pipeline.count import unpack_step_out
    s_ho, s_m = unpack_step_out(step(*args))

    mesh = make_mesh(8)
    sharded_batch = shard_batch_arrays(mesh, batch)
    sharded = make_sharded_step(step, mesh)
    multi = sharded(sharded_batch["bc_packed"], sharded_batch["bc_qual"],
                    sharded_batch["bc_exact"], sharded_batch["umi_packed"],
                    sharded_batch["umi_valid"], sharded_batch["rna"],
                    sharded_batch["rna_nmask"], sharded_batch["slot_valid"],
                    wl_sorted)
    m_ho, m_m = unpack_step_out(multi)

    for k in ["gene", "umi", "conf_ok", "pos", "mapq", "strand"]:
        np.testing.assert_array_equal(s_ho[k], m_ho[k],
                                      err_msg=f"mismatch in {k}")
    assert s_m == m_m


def test_sharded_histogram_psum():
    step, wl, genome, rng = ge._synthetic_setup()
    B = 64 * 8
    batch = ge._synthetic_batch(wl, genome, rng, B)
    from cellranger_tpu.ops.bucket_table import BucketTable
    wl_sorted = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3)
    hit, idx = bcops.whitelist_lookup(batch["bc_packed"], wl_sorted)
    expect = np.asarray(bcops.count_valid_barcodes(
        idx, batch["slot_valid"], wl.size))

    mesh = make_mesh(8)
    sb = shard_batch_arrays(mesh, {"idx": np.asarray(idx),
                                   "valid": np.asarray(batch["slot_valid"])})
    hist = make_sharded_bc_histogram(mesh, wl.size)(sb["idx"], sb["valid"])
    np.testing.assert_array_equal(np.asarray(hist), expect)
