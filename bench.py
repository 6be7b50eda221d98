"""Benchmark: reads aligned+counted per second per chip.

Three configs, one JSON line:
  * primary  — the fused device step (barcode correction + trimming +
    seed/extend alignment + annotation) on a 20MB genome / 100k whitelist
    (r01-comparable number);
  * human_scale — the same step against a 280MB repeat-seeded genome
    (forces the minimizer-winnowed index + parity position packing, the
    human-genome path of align/index.py) and a 3M-entry whitelist —
    multimapper pressure and full-scale HBM tables;
  * e2e      — wall-clock FASTQ -> filtered matrix via the public
    run_count on a synthetic on-disk run (decode, two passes, dedup,
    outputs — everything the step metric excludes).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "detail": {..., "human_scale": {...}, "e2e": {...}}}

Baseline: 8-core CPU STAR throughput for ~91bp scRNA-seq reads is on the
order of 1.25M reads/min/core => ~167k reads/s on 8 cores (BASELINE.md
targets >=5x that per chip, i.e. ~833k reads/s).

The human-scale genome index builds once (~4 min host) and is cached
under .bench_cache/ for later rounds.
"""

import json
import os
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

HUMAN_GENOME_LEN = 280_000_000   # > AUTO_MINIMIZER_LEN: minimizer + parity
HUMAN_REPEAT_LEN = 5_000_000     # repeated segment (multimapper pressure)
HUMAN_REPEAT_COPIES = 4
HUMAN_N_WL = 3_000_000           # 3M-february-2018-scale whitelist
HUMAN_TIMED_ITERS = 5

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def _build_step(genome: bytes, txome, chem):
    from cellranger_tpu.align.aligner import DeviceIndex
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.pipeline.count import _make_step

    t0 = time.time()
    gi = GenomeIndex.build({"chr1": genome}, txome)
    t_index = time.time() - t0
    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    step = _make_step(didx, ann, chem, READ_LEN)
    return step, t_index


def _make_batch(rng, genome_codes: np.ndarray, wl_seqs: np.ndarray,
                batch: int, chem, pos=None, n_errors: int = 2):
    """Synthetic batch -> (packed uint32 input plane, host time/s for the
    barcode resolve+pack, which is part of the steady-state pipeline but
    overlaps the device step in production)."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from cellranger_tpu.ops import barcode as bcops
    from cellranger_tpu.pipeline.count import pack_step_input

    G = len(genome_codes)
    if pos is None:
        pos = rng.integers(0, G - READ_LEN - 1, batch)
    rna = genome_codes[pos[:, None] + np.arange(READ_LEN)[None, :]].copy()
    if n_errors:
        err_pos = rng.integers(0, READ_LEN, (batch, n_errors))
        for j in range(n_errors):
            rna[np.arange(batch), err_pos[:, j]] ^= 1
    # 97% exact whitelist hits, 3% one sequencing error (real v3 runs)
    bc_i = rng.integers(0, len(wl_seqs), batch)
    bcs = wl_seqs[bc_i].copy()
    n_err = (batch * 3) // 100
    flip = (rng.integers(1, 4, n_err).astype(np.uint32)
            << (2 * rng.integers(0, 16, n_err)).astype(np.uint32))
    bcs[:n_err] ^= flip
    qual = np.full((batch, 16), 70, np.uint8)
    slot = np.ones(batch, bool)
    t0 = time.time()
    bc_idx, hit, corrected, _cb = bcops.host_resolve_barcodes(
        bcs, qual, slot, wl_seqs, np.ones(len(wl_seqs), np.int64), 16)
    shim = SimpleNamespace(
        batch_size=batch, umi_packed=rng.integers(
            0, 1 << 24, batch).astype(np.uint32),
        slot_valid=slot, umi_valid=np.ones(batch, bool), rna=rna,
        rna_nmask=np.ones((batch, READ_LEN), bool),
        rna2=None, rna2_nmask=None)
    buf = pack_step_input(chem, READ_LEN, shim, bc_idx)
    t_host = time.time() - t0
    return jnp.asarray(buf), t_host


def _time_step(step, args, iters: int, windows: int = 3):
    """Best-of-N timing windows: the tunneled device is shared, so single
    windows swing +-40%; the minimum reflects hardware capability."""
    import jax
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    for _ in range(WARMUP_ITERS):
        np.asarray(step(*args)["mvec"])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = step(*args)
        # force a device->host readback: block_until_ready alone can
        # return before remote execution finishes on tunneled backends
        from cellranger_tpu.pipeline.count import METRIC_FIELDS
        m = dict(zip(METRIC_FIELDS, np.asarray(out["mvec"]).tolist()))
        best = min(best, (time.time() - t0) / iters)
    return best, t_compile, m


def bench_primary(chem, txome_of):
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    genome = bases[genome_codes].tobytes()
    txome = txome_of(GENOME_LEN, 2000)
    wl = np.sort(np.unique(
        rng.integers(0, 2**32, N_WL, dtype=np.uint64).astype(np.uint32)))
    step, t_index = _build_step(genome, txome, chem)
    buf, t_host = _make_batch(rng, genome_codes, wl, BATCH, chem)
    print("bench[primary]: compiled+timing...", file=sys.stderr)
    dt, t_compile, m = _time_step(step, (buf,), TIMED_ITERS)
    return dict(reads_per_sec=BATCH / dt, step_ms=dt * 1e3,
                compile_s=t_compile, host_index_build_s=t_index,
                host_resolve_pack_ms=round(t_host * 1e3, 1),
                mapped_frac=m["n_mapped"] / BATCH,
                conf_frac=m["n_conf"] / BATCH)


def bench_human_scale(chem, txome_of):
    """Minimizer+parity index path: 280MB genome w/ repeats, 3M whitelist."""
    import jax.numpy as jnp
    from cellranger_tpu.align.aligner import DeviceIndex
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.pipeline.count import _make_step

    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    seg = rng.integers(0, 4, HUMAN_REPEAT_LEN).astype(np.uint8)
    rest_len = HUMAN_GENOME_LEN - HUMAN_REPEAT_COPIES * HUMAN_REPEAT_LEN
    genome_codes = np.concatenate(
        [np.tile(seg, HUMAN_REPEAT_COPIES),
         rng.integers(0, 4, rest_len).astype(np.uint8)])
    txome = txome_of(HUMAN_GENOME_LEN, 2000)

    os.makedirs(CACHE, exist_ok=True)
    idx_path = os.path.join(CACHE, "human_idx.npz")
    t0 = time.time()
    if os.path.exists(idx_path):
        gi = GenomeIndex.load(idx_path)
        built = "cache"
    else:
        genome = bases[genome_codes].tobytes()
        gi = GenomeIndex.build({"chr1": genome}, txome)
        gi.save(idx_path)
        built = "fresh"
    t_index = time.time() - t0

    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    step = _make_step(didx, ann, chem, READ_LEN)
    wl = np.sort(np.unique(rng.integers(
        0, 2**32, HUMAN_N_WL + 200_000, dtype=np.uint64)
        .astype(np.uint32)))[:HUMAN_N_WL]
    # reads: 25% drawn FROM the repeated segment (multimapper pressure);
    # the rest uniform over the whole genome
    rng2 = np.random.default_rng(2)
    n_rep = BATCH // 4
    pos = np.concatenate([
        rng2.integers(0, HUMAN_REPEAT_COPIES * HUMAN_REPEAT_LEN - READ_LEN,
                      n_rep),
        rng2.integers(0, HUMAN_GENOME_LEN - READ_LEN - 1, BATCH - n_rep)])
    rng2.shuffle(pos)
    buf, t_host = _make_batch(rng2, genome_codes, wl, BATCH, chem, pos=pos)
    print(f"bench[human]: index {built} ({t_index:.0f}s), compiling...",
          file=sys.stderr)
    dt, t_compile, m = _time_step(step, (buf,), HUMAN_TIMED_ITERS)
    truth = _human_truth_probe(step, genome_codes, wl, txome, chem)
    return dict(reads_per_sec=round(BATCH / dt, 1),
                step_ms=round(dt * 1e3, 2), compile_s=round(t_compile, 1),
                index_s=round(t_index, 1), index=built,
                genome_mb=HUMAN_GENOME_LEN / 1e6, whitelist=HUMAN_N_WL,
                mapped_frac=round(m["n_mapped"] / BATCH, 4),
                conf_frac=round(m["n_conf"] / BATCH, 4),
                truth=truth)


def _human_truth_probe(step, genome_codes, wl, txome, chem):
    """Truth-check the minimizer+parity index at full scale (VERDICT r2
    item 3): error-free reads drawn FROM '+'-strand transcript exons must
    conf-map to the RIGHT gene at MAPQ 255 off-repeat, and land at MAPQ
    <255 (multimapped, never falsely confident) inside the 4-copy repeat
    region.  Raises AssertionError on a recall/precision regression."""
    from cellranger_tpu.pipeline.count import unpack_step_out

    rep_end = HUMAN_REPEAT_COPIES * HUMAN_REPEAT_LEN
    spacing = HUMAN_GENOME_LEN // 2000
    rng = np.random.default_rng(7)

    def genic(p):  # read [p, p+READ_LEN) overlaps a gene's exon span?
        off = p % spacing
        return 1000 - READ_LEN < off < 3400

    pos_list, gene_list, in_rep = [], [], []
    half = BATCH // 2
    while len(pos_list) < half:
        # repeat probe: positions INTERGENIC at all 4 copies — promotion
        # cannot apply, so an honest aligner must report MAPQ < 255
        p = int(rng.integers(0, HUMAN_REPEAT_LEN - READ_LEN))
        if any(genic(p + c * HUMAN_REPEAT_LEN)
               for c in range(HUMAN_REPEAT_COPIES)):
            continue
        pos_list.append(p)
        gene_list.append(-1)
        in_rep.append(True)
    while len(pos_list) < BATCH:
        g = int(rng.integers(0, 2000)) & ~1   # '+'-strand genes only
        start = g * spacing + 1000
        if start + 600 <= rep_end or start + 600 > HUMAN_GENOME_LEN - 1000:
            continue
        pos_list.append(start + int(rng.integers(0, 600 - READ_LEN)))
        gene_list.append(g)
        in_rep.append(False)
    pos = np.asarray(pos_list)
    true_gene = np.asarray(gene_list)
    in_rep = np.asarray(in_rep)
    buf, _ = _make_batch(rng, genome_codes, wl, BATCH, chem, pos=pos,
                         n_errors=0)
    ho, _m = unpack_step_out(step(buf))
    off = ~in_rep
    gene_ok = (ho["gene"].astype(np.int64) == true_gene) & ho["conf_ok"]
    off_recall = float((gene_ok & (ho["mapq"] == 255))[off].mean())
    rep_lowmapq = float((ho["mapped"] & (ho["mapq"] < 255))[in_rep].mean())
    rep_false_conf = float((ho["conf_ok"] & (ho["mapq"] == 255))[in_rep]
                           .mean())
    out = dict(off_repeat_correct_gene_mapq255=round(off_recall, 4),
               repeat_low_mapq=round(rep_lowmapq, 4),
               repeat_false_confident=round(rep_false_conf, 4))
    assert off_recall >= 0.99, out
    assert rep_lowmapq >= 0.90, out
    assert rep_false_conf <= 0.01, out
    return out


E2E_READS = int(os.environ.get("CRTPU_BENCH_E2E_READS", 1_000_000))
E2E_GENOME_LEN = 8_000_000
E2E_GENES = 800
E2E_CELLS = 2000
E2E_DUP = 2


def _gen_e2e_fixture(tmp: str, txome_of):
    """Vectorized synthetic run: E2E_READS reads = molecules emitted
    E2E_DUP times each, drawn from '+'-strand exons, 2% barcode errors.
    Uncompressed FASTQ so generation never dominates (~1M reads/s)."""
    from cellranger_tpu.io.gtf import write_fasta
    from cellranger_tpu.io.reference import ReferencePackage

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome_codes = rng.integers(0, 4, E2E_GENOME_LEN).astype(np.uint8)
    garr = bases[genome_codes]
    write_fasta(os.path.join(tmp, "g.fa"), {"chr1": garr.tobytes()})
    spacing = E2E_GENOME_LEN // E2E_GENES
    with open(os.path.join(tmp, "g.gtf"), "w") as f:
        for g in range(E2E_GENES):
            st = g * spacing + 1000
            s = "+" if g % 2 == 0 else "-"
            f.write(f'chr1\tx\texon\t{st + 1}\t{st + 600}\t.\t{s}\t.\t'
                    f'gene_id "G{g}"; transcript_id "T{g}"; '
                    f'gene_name "G{g}";\n')
            f.write(f'chr1\tx\texon\t{st + 1201}\t{st + 2400}\t.\t{s}\t.\t'
                    f'gene_id "G{g}"; transcript_id "T{g}"; '
                    f'gene_name "G{g}";\n')
    ref_dir = os.path.join(tmp, "ref")
    ReferencePackage.build(os.path.join(tmp, "g.fa"),
                           os.path.join(tmp, "g.gtf"), ref_dir)
    wl_rng = np.random.default_rng(4)
    wl = sorted({"".join(wl_rng.choice(list("ACGT"), 16))
                 for _ in range(24_000)})[:20_000]
    wl_path = os.path.join(tmp, "wl.txt")
    with open(wl_path, "w") as f:
        f.writelines(w + "\n" for w in wl)
    wl_arr = np.asarray([list(w.encode()) for w in wl], np.uint8)

    n_mol = E2E_READS // E2E_DUP
    cell_idx = rng.integers(0, E2E_CELLS, n_mol)
    bc = wl_arr[cell_idx]
    umi = bases[rng.integers(0, 4, (n_mol, 12))]
    gene = rng.integers(0, E2E_GENES // 2, n_mol) * 2   # '+' strand only
    off = rng.integers(0, 600 - READ_LEN - 8, n_mol)
    pos = gene * spacing + 1000 + off
    cdna = garr[pos[:, None] + np.arange(READ_LEN)[None, :]]
    # duplicate each molecule E2E_DUP times, shuffle read order
    order = rng.permutation(n_mol * E2E_DUP)
    rep = lambda a: np.repeat(a, E2E_DUP, axis=0)[order]
    bc, umi, cdna = rep(bc), rep(umi), rep(cdna)
    # 2% of reads carry one barcode base error (exercises correction)
    n_err = len(bc) // 50
    bc[np.arange(n_err), rng.integers(0, 16, n_err)] = bases[
        rng.integers(0, 4, n_err)]

    r1p = os.path.join(tmp, "e2e_S1_L001_R1_001.fastq")
    r2p = os.path.join(tmp, "e2e_S1_L001_R2_001.fastq")

    def block(seqmat):
        n_, w_ = seqmat.shape
        name = np.frombuffer(b"@readxxxxxxxxxx\n", np.uint8)
        rows = np.empty((n_, len(name) + 2 * w_ + 4), np.uint8)
        rows[:, :len(name)] = name
        rows[:, len(name):len(name) + w_] = seqmat
        o = len(name) + w_
        rows[:, o] = ord("\n")
        rows[:, o + 1] = ord("+")
        rows[:, o + 2] = ord("\n")
        rows[:, o + 3:o + 3 + w_] = ord("F")
        rows[:, -1] = ord("\n")
        return rows.tobytes()

    with open(r1p, "wb") as f1, open(r2p, "wb") as f2:
        C = 1 << 19
        for i in range(0, len(bc), C):
            f1.write(block(np.concatenate(
                [bc[i:i + C], umi[i:i + C]], axis=1)))
            f2.write(block(cdna[i:i + C]))
    return dict(ref=ref_dir, wl=wl_path, fq1=r1p, fq2=r2p,
                n_reads=len(bc), n_molecules=n_mol)


def bench_e2e(txome_of):
    """Wall-clock FASTQ -> filtered matrix via the public run_count.

    Runs TWICE in-process: the cold run is a fresh-process start — with a
    populated AOT executable cache (cellranger_tpu/aot.py) it LOADS the
    fused step + dedup executables instead of compiling, so "cold" now
    measures trace+load+upload, not minutes of remote compiles; on a
    never-seen machine it pays the compiles once and stores them.  The
    warm run is the steady-state number (VERDICT r3 item 1 — report
    compile separately from steady state).  1M reads so fixed costs
    don't dominate."""
    import tempfile
    from cellranger_tpu.pipeline.count import CountConfig, run_count

    tmp = tempfile.mkdtemp(prefix="cr_tpu_bench_e2e_")
    t0 = time.time()
    fx = _gen_e2e_fixture(tmp, txome_of)
    t_fix = time.time() - t0
    print(f"bench[e2e]: fixture {fx['n_reads']} reads ({t_fix:.0f}s); "
          "cold run...", file=sys.stderr)

    def one_run(out_dir):
        cfg = CountConfig(
            fastq_pairs=[(fx["fq1"], fx["fq2"])], reference_path=fx["ref"],
            whitelist_path=fx["wl"], chemistry="SC3Pv3", read_len=READ_LEN,
            batch_size=32768, secondary_analysis=False, checkpoint=False)
        t0 = time.time()
        summary = run_count(cfg, out_dir)
        wall = time.time() - t0
        agg: dict = {}
        try:
            with open(os.path.join(out_dir, "_perf.json")) as f:
                for ph in json.load(f)["phases"]:
                    agg[ph["name"]] = round(
                        agg.get(ph["name"], 0) + ph["wall_s"], 2)
        except Exception:
            pass
        return wall, summary, agg

    cold_wall, summary, cold_phases = one_run(os.path.join(tmp, "out_cold"))
    print(f"bench[e2e]: cold {cold_wall:.1f}s; warm run...", file=sys.stderr)
    warm_wall, summary, warm_phases = one_run(os.path.join(tmp, "out_warm"))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    from cellranger_tpu import aot
    aot_dir = aot.cache_dir()
    n_aot = (len([f for f in os.listdir(aot_dir) if f.endswith(".jaxexec")])
             if aot_dir and os.path.isdir(aot_dir) else 0)
    return dict(reads=fx["n_reads"], wall_s=round(warm_wall, 2),
                reads_per_sec=round(fx["n_reads"] / warm_wall, 1),
                cold_wall_s=round(cold_wall, 2),
                cold_reads_per_sec=round(fx["n_reads"] / cold_wall, 1),
                compile_overhead_s=round(cold_wall - warm_wall, 2),
                aot_cache_execs=n_aot,
                fixture_gen_s=round(t_fix, 1),
                conf_mapped_frac=round(summary["conf_mapped_frac"], 4),
                total_molecules=summary["total_molecules"],
                phase_s=warm_phases, cold_phase_s=cold_phases)


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome

    def txome_of(genome_len: int, n_genes: int) -> Transcriptome:
        genes, txs = [], []
        spacing = genome_len // n_genes
        for g in range(n_genes):
            start = g * spacing + 1000
            strand = "+" if g % 2 == 0 else "-"
            genes.append(Gene(f"G{g}", f"G{g}", "chr1", strand, g))
            txs.append(Transcript(f"T{g}", g, "chr1", strand,
                                  [(start, start + 600),
                                   (start + 1200, start + 2400)]))
        return Transcriptome(genes, txs)

    chem = get_chemistry("SC3Pv3")
    primary = bench_primary(chem, txome_of)

    extra = {}

    def emit():
        # progressively-complete JSON lines: the driver takes the LAST
        # line, so a timeout mid-section still leaves a valid result
        result = {
            "metric": "reads_aligned_counted_per_sec_per_chip",
            "value": round(primary["reads_per_sec"], 1),
            "unit": "reads/s",
            "vs_baseline": round(primary["reads_per_sec"]
                                 / BASELINE_READS_PER_SEC, 3),
            "detail": {
                "batch": BATCH, "read_len": READ_LEN,
                "genome_mb": GENOME_LEN / 1e6,
                "mapped_frac": round(primary["mapped_frac"], 4),
                "step_ms": round(primary["step_ms"], 2),
                "compile_s": round(primary["compile_s"], 1),
                "host_index_build_s": round(primary["host_index_build_s"],
                                            1),
                "device": str(jax.devices()[0]),
                **extra,
            },
        }
        print(json.dumps(result), flush=True)

    emit()
    if os.environ.get("CRTPU_BENCH_FAST") != "1":
        # big_run (>=20M reads, tools/big_run.py) is too slow for every
        # driver round; include the last recorded result with provenance
        try:
            br_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BIG_RUN.json")
            if os.path.exists(br_path):
                extra["big_run"] = json.load(open(br_path))
        except Exception:
            pass
        # human_scale runs BEFORE the (compile-heavy) e2e cold pass so a
        # driver timeout still captures the headline step configs
        try:
            extra["human_scale"] = bench_human_scale(chem, txome_of)
        except Exception as e:  # record, don't lose the primary number
            extra["human_scale"] = {"error": str(e)[:300]}
        emit()
        try:
            extra["e2e"] = bench_e2e(txome_of)
        except Exception as e:
            extra["e2e"] = {"error": str(e)[:300]}
        emit()
        try:
            # SPMD scaling on the virtual CPU mesh (separate process so
            # the TPU backend here is untouched); see tools/scaling_bench
            import subprocess
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "scaling_bench.py")],
                capture_output=True, timeout=540, text=True)
            extra["scaling"] = json.loads(
                r.stdout.strip().splitlines()[-1])
        except Exception as e:
            extra["scaling"] = {"error": str(e)[:200]}
        emit()


if __name__ == "__main__":
    main()
