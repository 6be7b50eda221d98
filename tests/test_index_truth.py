"""Truth-check of the minimizer+parity index path (VERDICT r2 item 3):
reads drawn FROM transcripts must land on the right gene at MAPQ 255
off-repeat, and repeat-region reads must be multimapped (MAPQ < 255,
never falsely confident) — at a CPU-tractable scale, forcing the same
sampling='minimizer', pos_mode='parity' code path the 280MB human-scale
config auto-selects (align/index.py:224-227)."""

import numpy as np
import pytest

from cellranger_tpu.align.aligner import DeviceIndex
from cellranger_tpu.align.annotate import AnnotationIndex
from cellranger_tpu.align.index import GenomeIndex
from cellranger_tpu.io.chemistry import get_chemistry
from cellranger_tpu.io.gtf import Gene, Transcript, Transcriptome
from cellranger_tpu.ops import barcode as bcops
from cellranger_tpu.pipeline.count import (_make_step, pack_step_input,
                                           unpack_step_out)

READ_LEN = 91
REPEAT_LEN = 200_000
COPIES = 4
GENOME_LEN = 3_000_000
N_GENES = 120
SPACING = GENOME_LEN // N_GENES
BATCH = 2048


def _txome():
    genes, txs = [], []
    for g in range(N_GENES):
        start = g * SPACING + 1000
        strand = "+" if g % 2 == 0 else "-"
        genes.append(Gene(f"G{g}", f"G{g}", "chr1", strand, g))
        txs.append(Transcript(f"T{g}", g, "chr1", strand,
                              [(start, start + 600),
                               (start + 1200, start + 2400)]))
    return Transcriptome(genes, txs)


@pytest.fixture(scope="module")
def mini_index():
    rng = np.random.default_rng(21)
    seg = rng.integers(0, 4, REPEAT_LEN).astype(np.uint8)
    rest = GENOME_LEN - COPIES * REPEAT_LEN
    codes = np.concatenate([np.tile(seg, COPIES),
                            rng.integers(0, 4, rest).astype(np.uint8)])
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = bases[codes].tobytes()
    txome = _txome()
    gi = GenomeIndex.build({"chr1": genome}, txome,
                           sampling="minimizer", pos_mode="parity")
    didx = DeviceIndex.from_host(gi)
    ann = AnnotationIndex.build(txome, gi)
    chem = get_chemistry("SC3Pv3")
    step = _make_step(didx, ann, chem, READ_LEN)
    return codes, step, chem


def _run(codes, step, chem, pos):
    n = len(pos)
    rna = codes[np.asarray(pos)[:, None] + np.arange(READ_LEN)[None, :]]
    rng = np.random.default_rng(3)
    wl = np.sort(np.unique(rng.integers(0, 2**32, 4096,
                                        dtype=np.uint64).astype(np.uint32)))
    bcs = wl[rng.integers(0, len(wl), n)]
    bc_idx, *_ = bcops.host_resolve_barcodes(
        bcs, np.full((n, 16), 70, np.uint8), np.ones(n, bool), wl,
        np.ones(len(wl), np.int64), 16)
    from types import SimpleNamespace
    shim = SimpleNamespace(
        batch_size=n,
        umi_packed=rng.integers(0, 1 << 24, n).astype(np.uint32),
        slot_valid=np.ones(n, bool), umi_valid=np.ones(n, bool),
        rna=rna, rna_nmask=np.ones((n, READ_LEN), bool),
        rna2=None, rna2_nmask=None)
    buf = pack_step_input(chem, READ_LEN, shim, bc_idx)
    ho, _ = unpack_step_out(step(buf))
    return ho


def test_off_repeat_exonic_recall(mini_index):
    codes, step, chem = mini_index
    rng = np.random.default_rng(5)
    rep_end = COPIES * REPEAT_LEN
    pos, gene = [], []
    while len(pos) < BATCH:
        g = int(rng.integers(0, N_GENES)) & ~1
        start = g * SPACING + 1000
        if start < rep_end or start + 600 > GENOME_LEN - 1000:
            continue
        pos.append(start + int(rng.integers(0, 600 - READ_LEN)))
        gene.append(g)
    ho = _run(codes, step, chem, pos)
    ok = (ho["conf_ok"] & (ho["gene"].astype(np.int64) == np.asarray(gene))
          & (ho["mapq"] == 255))
    assert ok.mean() >= 0.99, float(ok.mean())


def test_repeat_reads_low_mapq(mini_index):
    codes, step, chem = mini_index
    rng = np.random.default_rng(6)

    def genic(p):
        off = p % SPACING
        return 1000 - READ_LEN < off < 3400

    pos = []
    while len(pos) < BATCH:
        p = int(rng.integers(0, REPEAT_LEN - READ_LEN))
        if any(genic(p + c * REPEAT_LEN) for c in range(COPIES)):
            continue
        pos.append(p)
    ho = _run(codes, step, chem, pos)
    mapped = ho["mapped"]
    low = mapped & (ho["mapq"] < 255)
    false_conf = ho["conf_ok"] & (ho["mapq"] == 255)
    assert mapped.mean() >= 0.95, float(mapped.mean())
    assert low[mapped].mean() >= 0.95, float(low[mapped].mean())
    assert false_conf.mean() <= 0.01, float(false_conf.mean())
