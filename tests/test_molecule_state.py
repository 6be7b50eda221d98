"""MoleculeState: the device-resident dedup accumulator (parallel/executor).

The r5 drain probe showed the merge-every-drain absorb re-sorting the
whole multi-M-row state every 32 batches (~1-2s each on hardware);
absorb is now append-only with exact_merge deferred to capacity
pressure.  These tests pin the correctness contract that makes that
safe: duplicate (bc, gene, umi) triples with read weights must sum
identically whether merged eagerly, lazily, or never (mark_dups.rs
semantics are defined on distinct triples + counts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.parallel.executor import MoleculeState
from cellranger_tpu.ops.dedup import dedup_molecules

UMI_LEN = 12


def _drain(rng, n_rows, cap, n_bc=7, n_gene=5, n_umi=9):
    """A synthetic drained [cap, 3] device buffer with n_rows live rows
    drawn from a SMALL key space (lots of cross-drain duplicates)."""
    bc = rng.integers(0, n_bc, n_rows).astype(np.uint32)
    gene = rng.integers(0, n_gene, n_rows).astype(np.uint32)
    umi = rng.integers(0, n_umi, n_rows).astype(np.uint32)
    mol = np.full((cap, 3), 0xFFFFFFFF, np.uint32)
    mol[:n_rows] = np.stack([bc, gene, umi], axis=1)
    return jnp.asarray(mol), n_rows, (bc, gene, umi)


def _reference_molecules(rows):
    """Host-truth dedup: distinct triples + read counts through the same
    dedup_molecules kernel (its own parity vs mark_dups.rs is pinned by
    tests/test_dedup.py / ref_dedup.py)."""
    bc = np.concatenate([r[0] for r in rows])
    gene = np.concatenate([r[1] for r in rows])
    umi = np.concatenate([r[2] for r in rows])
    N = 1 << int(np.ceil(np.log2(max(len(bc), 2))))
    pad = N - len(bc)
    bcp = np.pad(bc, (0, pad), constant_values=0)
    gp = np.pad(gene, (0, pad), constant_values=0)
    up = np.pad(umi, (0, pad), constant_values=0)
    valid = np.zeros(N, bool)
    valid[: len(bc)] = True
    dd = dedup_molecules(jnp.asarray(bcp), jnp.asarray(gp), jnp.asarray(up),
                         jnp.asarray(valid), UMI_LEN)
    v = np.asarray(dd["mol_valid"])
    tab = {}
    for b, g, u, r in zip(np.asarray(dd["mol_bc"])[v].tolist(),
                          np.asarray(dd["mol_gene"])[v].tolist(),
                          np.asarray(dd["mol_umi"])[v].tolist(),
                          np.asarray(dd["mol_reads"])[v].tolist()):
        tab[(b, g, u)] = tab.get((b, g, u), 0) + r
    return tab


def _state_molecules(st):
    b, g, u, r = st.finalize()
    tab = {}
    for bb, gg, uu, rr in zip(b.tolist(), g.tolist(), u.tolist(),
                              r.tolist()):
        tab[(bb, gg, uu)] = tab.get((bb, gg, uu), 0) + int(rr)
    return tab


def test_append_only_absorb_matches_reference():
    rng = np.random.default_rng(0)
    st = MoleculeState(1 << 14, UMI_LEN, min_capacity=1024)
    drains = []
    for _ in range(5):
        mol, n, raw = _drain(rng, 700, 1024)
        st.absorb(mol, jnp.int32(n), upper=900)   # bound looser than n
        drains.append(raw)
    assert not st.flushed
    assert _state_molecules(st) == _reference_molecules(drains)


def test_capacity_pressure_merges_then_flushes():
    """Small max_cap + loose bounds: absorb must merge on pressure, and
    flush only when distinct triples genuinely exceed capacity."""
    rng = np.random.default_rng(1)
    st = MoleculeState(1 << 12, UMI_LEN, min_capacity=1024)  # 4096 rows
    drains = []
    for _ in range(8):
        mol, n, raw = _drain(rng, 900, 1024)
        st.absorb(mol, jnp.int32(n), upper=1024)
        drains.append(raw)
    # tiny key space (7*5*9 = 315 triples): merges keep it device-resident
    assert not st.flushed
    assert _state_molecules(st) == _reference_molecules(drains)


def test_flush_path_matches_reference():
    """Distinct triples exceed max_cap: rows flush to host; the caller's
    partition dedup consumes reads-weighted rows (count.py overflow
    path), reproduced here."""
    rng = np.random.default_rng(2)
    st = MoleculeState(1 << 11, UMI_LEN, min_capacity=1024)  # 2048 rows
    drains = []
    for _ in range(6):
        mol, n, raw = _drain(rng, 1000, 1024,
                             n_bc=500, n_gene=40, n_umi=1 << 20)
        st.absorb(mol, jnp.int32(n), upper=1024)
        drains.append(raw)
    assert st.flushed   # ~6000 distinct triples >> 2048
    fb, fg, fu, fr = st.finalize()
    # host-side completion: weighted dedup over the flushed rows
    N = 1 << int(np.ceil(np.log2(max(len(fb), 2))))
    pad = N - len(fb)
    dd = dedup_molecules(
        jnp.asarray(np.pad(fb, (0, pad), constant_values=0)),
        jnp.asarray(np.pad(fg, (0, pad), constant_values=0)),
        jnp.asarray(np.pad(fu, (0, pad), constant_values=0)),
        jnp.asarray(np.arange(N) < len(fb)), UMI_LEN,
        reads=jnp.asarray(np.pad(fr, (0, pad), constant_values=0)))
    v = np.asarray(dd["mol_valid"])
    got = {}
    for b, g, u, r in zip(np.asarray(dd["mol_bc"])[v].tolist(),
                          np.asarray(dd["mol_gene"])[v].tolist(),
                          np.asarray(dd["mol_umi"])[v].tolist(),
                          np.asarray(dd["mol_reads"])[v].tolist()):
        got[(b, g, u)] = got.get((b, g, u), 0) + r
    assert got == _reference_molecules(drains)


def test_bound_never_understates_live_rows():
    """The non-blocking host bound must stay >= the device-exact count
    at every step (the append window-safety invariant)."""
    rng = np.random.default_rng(3)
    st = MoleculeState(1 << 13, UMI_LEN, min_capacity=1024)
    for _ in range(6):
        mol, n, _ = _drain(rng, 800, 1024)
        st.absorb(mol, jnp.int32(n), upper=1000)
        assert st.n >= int(st._n_dev)
        assert st.n <= st.cap
