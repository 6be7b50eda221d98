"""Human-scale step tuning sweep on real TPU (VERDICT r3 item 2): the
ablation (tools/step_ablate.py) showed lookup 25.8ms / extension 22.9ms /
vote-sort 12.0ms of a 73.5ms step.  This sweep measures the two cheap
knobs — minimizer seed headroom (S) and extension candidate count (D) —
WITH the truth probe, so recall/precision regressions are caught in the
same run.

Usage: python tools/step_tune.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32768
READ_LEN = 91
REPEAT_LEN = 5_000_000
REPEAT_COPIES = 4


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))

    import cellranger_tpu.params as params
    import cellranger_tpu.align.aligner as aligner_mod
    from cellranger_tpu.align.index import GenomeIndex
    from cellranger_tpu.align.aligner import DeviceIndex
    from cellranger_tpu.align.annotate import AnnotationIndex
    from cellranger_tpu.io.chemistry import get_chemistry
    from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
    from cellranger_tpu.pipeline.count import (_make_step, pack_step_input,
                                               unpack_step_out)
    from types import SimpleNamespace

    gi = GenomeIndex.load(os.path.join(repo, ".bench_cache",
                                       "human_idx.npz"))
    didx = DeviceIndex.from_host(gi)
    G = gi.genome_len
    spacing = G // 2000
    genes, txs = [], []
    for g in range(2000):
        start = g * spacing + 1000
        strand = "+" if g % 2 == 0 else "-"
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", strand, g))
        txs.append(Transcript(f"T{g}", g, "chr1", strand,
                              [(start, start + 600),
                               (start + 1200, start + 2400)]))
    txome = Transcriptome(genes, txs)
    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")
    print("setup done", file=sys.stderr, flush=True)

    # benchmark batch: 25% repeat reads + 2 errors (bench-identical)
    rng = np.random.default_rng(2)
    n_rep = BATCH // 4
    rep_end = REPEAT_COPIES * REPEAT_LEN
    pos = np.concatenate([
        rng.integers(0, rep_end - READ_LEN, n_rep),
        rng.integers(0, G - READ_LEN - 1, BATCH - n_rep)])
    rng.shuffle(pos)
    rna = gi.text[pos[:, None] + np.arange(READ_LEN)[None, :]] \
        .astype(np.uint8)
    for j in range(2):
        rna[np.arange(BATCH), rng.integers(0, READ_LEN, BATCH)] ^= 1

    def make_buf(rna_arr):
        shim = SimpleNamespace(
            batch_size=BATCH,
            umi_packed=rng.integers(0, 1 << 24, BATCH).astype(np.uint32),
            slot_valid=np.ones(BATCH, bool),
            umi_valid=np.ones(BATCH, bool), rna=rna_arr,
            rna_nmask=np.ones((BATCH, READ_LEN), bool),
            rna2=None, rna2_nmask=None)
        return pack_step_input(chem, READ_LEN, shim,
                               rng.integers(0, 3_000_000, BATCH)
                               .astype(np.int32))

    buf = make_buf(rna)

    # truth batch (bench.py _human_truth_probe logic, error-free)
    trng = np.random.default_rng(7)

    def genic(p):
        off = p % spacing
        return 1000 - READ_LEN < off < 3400

    pos_list, gene_list, in_rep = [], [], []
    half = BATCH // 2
    while len(pos_list) < half:
        p = int(trng.integers(0, REPEAT_LEN - READ_LEN))
        if any(genic(p + c * REPEAT_LEN) for c in range(REPEAT_COPIES)):
            continue
        pos_list.append(p)
        gene_list.append(-1)
        in_rep.append(True)
    while len(pos_list) < BATCH:
        g = int(trng.integers(0, 2000)) & ~1
        start = g * spacing + 1000
        if start + 600 <= rep_end or start + 600 > G - 1000:
            continue
        pos_list.append(start + int(trng.integers(0, 600 - READ_LEN)))
        gene_list.append(g)
        in_rep.append(False)
    tpos = np.asarray(pos_list)
    true_gene = np.asarray(gene_list)
    in_rep = np.asarray(in_rep)
    trna = gi.text[tpos[:, None] + np.arange(READ_LEN)[None, :]] \
        .astype(np.uint8)
    tbuf = make_buf(trna)

    def truth(step):
        ho, _ = unpack_step_out(step(tbuf))
        off = ~in_rep
        gene_ok = (ho["gene"].astype(np.int64) == true_gene) & ho["conf_ok"]
        return dict(
            off_recall=round(float(
                (gene_ok & (ho["mapq"] == 255))[off].mean()), 4),
            rep_lowmapq=round(float(
                (ho["mapped"] & (ho["mapq"] < 255))[in_rep].mean()), 4),
            rep_false_conf=round(float(
                (ho["conf_ok"] & (ho["mapq"] == 255))[in_rep].mean()), 4))

    def timestep(step):
        t0 = time.time()
        jax.block_until_ready(step(buf)["mvec"])
        t_c = time.time() - t0
        jax.block_until_ready(step(buf)["mvec"])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                out = step(buf)
            np.asarray(out["mvec"])
            best = min(best, (time.time() - t0) / 5)
        return best, t_c

    import cellranger_tpu.pipeline.count as count_mod

    results = {}
    base_hr = params.DEFAULTS["minimizer_seed_headroom"]
    for name, headroom, d, caps in (
            ("default", base_hr, aligner_mod.MAX_CANDIDATES, 4),
            ("caps8", base_hr, aligner_mod.MAX_CANDIDATES, 8),
            ("caps16", base_hr, aligner_mod.MAX_CANDIDATES, 16)):
        params._cache = None
        params.DEFAULTS["minimizer_seed_headroom"] = headroom
        old_d = aligner_mod.MAX_CANDIDATES
        old_r = aligner_mod.RESCUE_CAP_FRAC
        old_s = count_mod.SECOND_CAP_FRAC
        aligner_mod.MAX_CANDIDATES = d
        aligner_mod.RESCUE_CAP_FRAC = caps
        count_mod.SECOND_CAP_FRAC = caps
        try:
            step = _make_step(didx, ann, chem, READ_LEN)
            dt, t_c = timestep(step)
            tr = truth(step)
            results[name] = dict(step_ms=round(dt * 1e3, 2),
                                 reads_per_sec=round(BATCH / dt, 1),
                                 compile_s=round(t_c, 1), **tr)
            print(name, json.dumps(results[name]), flush=True)
        finally:
            aligner_mod.MAX_CANDIDATES = old_d
            aligner_mod.RESCUE_CAP_FRAC = old_r
            count_mod.SECOND_CAP_FRAC = old_s
    params.DEFAULTS["minimizer_seed_headroom"] = base_hr
    print(json.dumps(results))


if __name__ == "__main__":
    main()
