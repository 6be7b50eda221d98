"""Benchmark: reads aligned+counted per second per chip on the device
pipeline (barcode correction + seed/extend alignment + annotation).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: 8-core CPU STAR throughput for ~91bp scRNA-seq reads is on the
order of 1.25M reads/min/core => ~167k reads/s on 8 cores (BASELINE.md
targets >=5x that per chip, i.e. ~833k reads/s).
"""

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 167_000.0  # 8-core CPU STAR estimate
READ_LEN = 91
BATCH = 32768
GENOME_LEN = 20_000_000
N_WL = 100_000
WARMUP_ITERS = 2
TIMED_ITERS = 10


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the fused step compiles in minutes on
    # remote-compile backends; cache hits make reruns (and the driver's
    # round-end bench) start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from cellranger_tpu.align.aligner import DeviceIndex, make_aligner
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.io.whitelist import Whitelist
    from cellranger_tpu.ops import encode
    from cellranger_tpu.pipeline.count import _make_step

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    genome = bases[genome_codes].tobytes()

    # synthetic transcriptome: 2000 genes tiling the genome
    genes, txs = [], []
    spacing = GENOME_LEN // 2000
    for g in range(2000):
        start = g * spacing + 1000
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", "+" if g % 2 == 0 else "-", g))
        txs.append(Transcript(f"T{g}", g, "chr1", "+" if g % 2 == 0 else "-",
                              [(start, start + 600), (start + 1200, start + 2400)]))
    txome = Transcriptome(genes, txs)

    t0 = time.time()
    gi = GenomeIndex.build({"chr1": genome}, txome)
    t_index = time.time() - t0
    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")

    wl_arr = np.unique(rng.integers(0, 2**32, N_WL, dtype=np.uint64).astype(np.uint32))
    wl = Whitelist(np.sort(wl_arr), 16, "bench")
    step = _make_step(didx, ann, wl.size, chem, READ_LEN)
    from cellranger_tpu.ops.bucket_table import BucketTable
    wl_sorted = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3).with_counts(np.ones(wl.size, np.int64))

    # synthetic batch: reads drawn from the genome with 2 errors each
    pos = rng.integers(0, GENOME_LEN - READ_LEN - 1, BATCH)
    idx2 = pos[:, None] + np.arange(READ_LEN)[None, :]
    rna = genome_codes[idx2]
    err_pos = rng.integers(0, READ_LEN, (BATCH, 2))
    for j in range(2):
        rna[np.arange(BATCH), err_pos[:, j]] ^= 1
    # barcodes: 97% exact whitelist hits, 3% carry one sequencing error —
    # real 10x v3 runs report ~97% valid barcodes; the adaptive step
    # buckets the correction capacity to the actual invalid count
    bc_idx = rng.integers(0, wl.size, BATCH)
    bcs = wl.sorted_seqs[bc_idx].copy()
    n_err = (BATCH * 3) // 100
    flip = (rng.integers(1, 4, n_err).astype(np.uint32)
            << (2 * rng.integers(0, 16, n_err)).astype(np.uint32))
    bcs[:n_err] ^= flip
    args = (
        jnp.asarray(bcs),
        jnp.full((BATCH, 16), 70, jnp.uint8),
        jnp.ones(BATCH, bool),
        jnp.asarray(rng.integers(0, 1 << 24, BATCH).astype(np.uint32)),
        jnp.ones(BATCH, bool),
        jnp.asarray(rna),
        jnp.ones((BATCH, READ_LEN), bool),
        jnp.ones(BATCH, bool),
        wl_sorted,
    )

    print(f"bench: index built ({t_index:.0f}s), compiling...", file=sys.stderr)
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    print(f"bench: compiled in {t_compile:.0f}s, timing...", file=sys.stderr)

    for _ in range(WARMUP_ITERS):
        np.asarray(step(*args)["metrics"]["n_mapped"])
    t0 = time.time()
    for _ in range(TIMED_ITERS):
        out = step(*args)
    # force a device->host readback: block_until_ready alone can return
    # before remote execution finishes on tunneled backends
    mapped = int(np.asarray(out["metrics"]["n_mapped"]))
    dt = (time.time() - t0) / TIMED_ITERS

    reads_per_sec = BATCH / dt
    result = {
        "metric": "reads_aligned_counted_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
        "detail": {
            "batch": BATCH, "read_len": READ_LEN,
            "genome_mb": GENOME_LEN / 1e6, "mapped_frac": mapped / BATCH,
            "step_ms": round(dt * 1e3, 2), "compile_s": round(t_compile, 1),
            "host_index_build_s": round(t_index, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
