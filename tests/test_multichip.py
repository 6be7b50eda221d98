"""Sharded execution over the 8-virtual-device CPU mesh: the sharded step
must produce identical results to the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from cellranger_tpu.parallel.mesh import (
    make_mesh, make_sharded_step, make_sharded_bc_histogram,
    shard_batch_arrays)
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
    buf, host = ge._synthetic_batch(wl, genome, rng, B)
    from cellranger_tpu.pipeline.count import unpack_step_out
    s_ho, s_m = unpack_step_out(step(buf))

    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    buf_sh = jax.device_put(np.asarray(buf), NamedSharding(mesh, P("data")))
    sharded = make_sharded_step(step, mesh)
    m_ho, m_m = unpack_step_out(sharded(buf_sh))

    for k in ["gene", "conf_ok", "pos", "mapq", "strand"]:
        np.testing.assert_array_equal(s_ho[k], m_ho[k],
                                      err_msg=f"mismatch in {k}")
    assert s_m == m_m


def test_sharded_histogram_psum():
    step, wl, genome, rng = ge._synthetic_setup()
    B = 64 * 8
    buf, host = ge._synthetic_batch(wl, genome, rng, B)
    from cellranger_tpu.ops.bucket_table import BucketTable
    wl_sorted = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3)
    slot = np.ones(B, bool)
    hit, idx = bcops.whitelist_lookup(jnp.asarray(host["bc_packed"]),
                                      wl_sorted)
    expect = np.asarray(bcops.count_valid_barcodes(
        idx, jnp.asarray(slot), wl.size))

    mesh = make_mesh(8)
    sb = shard_batch_arrays(mesh, {"idx": np.asarray(idx), "valid": slot})
    hist = make_sharded_bc_histogram(mesh, wl.size)(sb["idx"], sb["valid"])
    np.testing.assert_array_equal(np.asarray(hist), expect)
