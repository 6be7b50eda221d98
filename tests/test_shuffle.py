"""Sharded barcode-shuffle dedup == single-device dedup (8-dev CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from cellranger_tpu.ops.dedup import dedup_molecules
from cellranger_tpu.parallel.mesh import make_mesh
from cellranger_tpu.parallel.shuffle import make_sharded_dedup

UMI_LEN = 6


def molecules_of(dd, valid_key="mol_valid"):
    v = np.asarray(dd[valid_key])
    out = {}
    for i in np.flatnonzero(v):
        key = (int(np.asarray(dd["mol_bc"])[i]),
               int(np.asarray(dd["mol_gene"])[i]),
               int(np.asarray(dd["mol_umi"])[i]))
        out[key] = int(np.asarray(dd["mol_reads"])[i])
    return out


def test_sharded_dedup_matches_single():
    rng = np.random.default_rng(42)
    n_chips = 8
    per_chip = 512
    N = n_chips * per_chip
    n_real = 3000
    bc = rng.integers(0, 40, N).astype(np.uint32)
    gene = rng.integers(0, 5, N).astype(np.uint32)
    umi = (rng.integers(0, 1 << (2 * UMI_LEN), N).astype(np.uint32)
           & np.uint32(0b110011001100))  # force 1-HD collisions
    valid = np.zeros(N, bool)
    valid[:n_real] = True

    single = dedup_molecules(jnp.asarray(bc), jnp.asarray(gene),
                             jnp.asarray(umi), jnp.asarray(valid), UMI_LEN)
    expect = molecules_of(single)

    mesh = make_mesh(n_chips)
    fn = make_sharded_dedup(mesh, per_chip, UMI_LEN, slack=8.0)
    dd = fn(jnp.asarray(bc), jnp.asarray(gene), jnp.asarray(umi),
            jnp.asarray(valid))
    assert int(np.asarray(dd["overflow"]).sum()) == 0
    got = molecules_of(dd)
    assert got == expect
    assert int(np.asarray(dd["n_molecules"]).sum()) == len(expect)


def test_sharded_dedup_overflow_detected():
    rng = np.random.default_rng(1)
    n_chips = 8
    per_chip = 256
    N = n_chips * per_chip
    # all rows to one barcode -> one destination bucket overflows at low slack
    bc = np.zeros(N, np.uint32)
    gene = np.zeros(N, np.uint32)
    umi = rng.integers(0, 1 << 12, N).astype(np.uint32)
    valid = np.ones(N, bool)
    mesh = make_mesh(n_chips)
    fn = make_sharded_dedup(mesh, per_chip, UMI_LEN, slack=1.0)
    dd = fn(jnp.asarray(bc), jnp.asarray(gene), jnp.asarray(umi),
            jnp.asarray(valid))
    assert int(np.asarray(dd["overflow"]).sum()) > 0
