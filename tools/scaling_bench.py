"""SPMD scaling measurement on the virtual CPU mesh (BASELINE.md multi-
node scaling target; VERDICT r2 item 5).  XLA's CPU backend runs virtual
devices on separate host threads, so sharding the fused count step over a
2-device mesh on a 2-core host measures REAL parallel speedup of our
shard_map/psum path (mesh sizes beyond the core count would only measure
oversubscription, so the mesh is sized to min(cores, 8)).

Prints one JSON line: {"mesh": N, "t1_ms": .., "tN_ms": .., "efficiency": ..}
Run standalone (it forces the CPU backend before any JAX touch).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = min(os.cpu_count() or 1, 8)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from cellranger_tpu.align.aligner import DeviceIndex
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.ops import barcode as bcops
    from cellranger_tpu.parallel.mesh import make_mesh, make_sharded_step
    from cellranger_tpu.pipeline.count import _make_step, pack_step_input

    READ_LEN = 91
    PER_DEV = 4096
    BATCH = PER_DEV * N_DEV
    rng = np.random.default_rng(0)
    G = 4_000_000
    codes = rng.integers(0, 4, G).astype(np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genes, txs = [], []
    for g in range(60):
        s = g * (G // 60) + 1000
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", "+", g))
        txs.append(Transcript(f"T{g}", g, "chr1", "+", [(s, s + 2400)]))
    txome = Transcriptome(genes, txs)
    gi = GenomeIndex.build({"chr1": bases[codes].tobytes()}, txome)
    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")
    step = _make_step(didx, ann, chem, READ_LEN)

    wl = np.sort(np.unique(rng.integers(0, 2**32, 65536, dtype=np.uint64)
                           .astype(np.uint32)))
    pos = rng.integers(0, G - READ_LEN - 1, BATCH)
    rna = codes[pos[:, None] + np.arange(READ_LEN)[None, :]]
    bcs = wl[rng.integers(0, len(wl), BATCH)]
    bc_idx, *_ = bcops.host_resolve_barcodes(
        bcs, np.full((BATCH, 16), 70, np.uint8), np.ones(BATCH, bool), wl,
        np.ones(len(wl), np.int64), 16)
    from types import SimpleNamespace
    shim = SimpleNamespace(
        batch_size=BATCH,
        umi_packed=rng.integers(0, 1 << 24, BATCH).astype(np.uint32),
        slot_valid=np.ones(BATCH, bool), umi_valid=np.ones(BATCH, bool),
        rna=rna, rna_nmask=np.ones((BATCH, READ_LEN), bool),
        rna2=None, rna2_nmask=None)
    buf = pack_step_input(chem, READ_LEN, shim, bc_idx)

    def timeit(fn, iters=6):
        jax.block_until_ready(fn(buf)["i32"])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                out = fn(buf)
            jax.block_until_ready(out["i32"])
            best = min(best, (time.time() - t0) / iters)
        return best

    t1 = timeit(step)
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_step(step, mesh)
    tn = timeit(sharded)

    # ---- weak-scaling curve (VERDICT r3 item 8): fixed PER-DEVICE batch
    # over mesh sizes 1/2/4/8.  Ideal weak scaling = flat time.  CAVEAT:
    # this host has N_CORES cores; virtual devices beyond that measure
    # oversubscription, so the curve is annotated with the core count and
    # efficiency is only meaningful up to it.
    curve = {}
    n_cores = os.cpu_count() or 1
    for n in (1, 2, 4, 8):
        if n > N_DEV and n > 1:
            break
        bn = PER_DEV * n
        bufn = buf[:bn] if bn <= BATCH else np.tile(
            buf, (-(-bn // BATCH), 1))[:bn]
        if n == 1:
            fn = step
        else:
            fn = make_sharded_step(step, make_mesh(n))

        def tm(fn=fn, bufn=bufn):
            jax.block_until_ready(fn(bufn)["i32"])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(4):
                    out = fn(bufn)
                jax.block_until_ready(out["i32"])
                best = min(best, (time.time() - t0) / 4)
            return best

        curve[n] = round(tm() * 1e3, 1)
    base = curve.get(1)
    weak_eff = {n: round(base / t, 3) for n, t in curve.items() if base}
    # the 1-device run already saturates every host core via XLA intra-op
    # threading, so n virtual devices run n x the work on the SAME cores:
    # the host ideal is eff = 1/n, i.e. normalized = eff * n.  >= ~0.9
    # means the SPMD path adds no overhead beyond the hardware cap (the
    # true >=0.85 target needs real multi-chip ICI)
    weak_eff_norm = {n: round(e * n, 3) for n, e in weak_eff.items()}

    # ---- per-batch collective overhead, measured alone: the step's psum
    # (metric vector) and the dedup exchange's all_to_all, in microseconds
    from jax.sharding import PartitionSpec as P
    mvec = np.zeros((N_DEV, 16), np.int32)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data"),
                       out_specs=P())
    def just_psum(x):
        return jax.lax.psum(x[0], "data")

    rows = np.zeros((N_DEV * PER_DEV, 4), np.uint32)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data"),
                       out_specs=P("data"))
    def just_a2a(x):
        y = x.reshape(N_DEV, -1, x.shape[-1])
        return jax.lax.all_to_all(y, "data", 0, 0,
                                  tiled=False).reshape(-1, x.shape[-1])

    def utime(fn, arg):
        jax.block_until_ready(fn(arg))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(20):
                out = fn(arg)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / 20)
        return best * 1e6

    psum_us = round(utime(just_psum, mvec), 1)
    a2a_us = round(utime(just_a2a, rows), 1)

    # CAVEAT: XLA's CPU backend already multi-threads the single-device
    # run across all host cores, so the fair per-mesh number here is the
    # SAME-TOTAL-WORK speedup (ideal 1.0 means sharding adds no overhead
    # over intra-op threading; >1 means the SPMD path parallelizes better)
    print(json.dumps(dict(
        mesh=N_DEV, batch=BATCH, n_cores=n_cores,
        t1_ms=round(t1 * 1e3, 1), tN_ms=round(tn * 1e3, 1),
        same_total_work_speedup=round(t1 / tn, 3),
        weak_curve_ms=curve, weak_efficiency=weak_eff,
        weak_efficiency_vs_host_ideal=weak_eff_norm,
        psum_us=psum_us, all_to_all_us=a2a_us,
        note=(f"host has {n_cores} cores; virtual-device counts beyond "
              "that measure oversubscription, not scaling"))))


if __name__ == "__main__":
    main()
