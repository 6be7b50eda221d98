"""Stage-level profile of the pass-2 loop on real TPU: separates producer
(decode+resolve+pack), host->device transfer, and device step time, and
reports whether per-batch cost drifts over the run (superlinearity hunt).

Usage: python tools/pass2_profile.py <run_dir> [n_batches]
run_dir: a tools/big_run.py directory (FASTQs + ref + wl.txt).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

run_dir = sys.argv[1]
n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 120

from cellranger_tpu.io.chemistry import get_chemistry
from cellranger_tpu.io.fastq import batches_from_fastqs
from cellranger_tpu.io.reference import ReferencePackage
from cellranger_tpu.io.whitelist import Whitelist
from cellranger_tpu.align.aligner import DeviceIndex
from cellranger_tpu.align.annotate import AnnotationIndex
from cellranger_tpu.ops import barcode as bcops
from cellranger_tpu.pipeline.count import (_make_step, pack_step_input)
from cellranger_tpu.parallel.executor import Executor

READ_LEN = 91
BATCH = 16384
chem = get_chemistry("SC3Pv3")

t0 = time.time()
ref = ReferencePackage.load(os.path.join(run_dir, "ref"))
gi = ref.genome_index
didx = DeviceIndex.from_host(gi)
ann_idx = AnnotationIndex.build(ref.transcriptome, gi)
wl = Whitelist.load(os.path.join(run_dir, "wl.txt"))
wl_counts = np.ones(wl.size, np.int64)


def resolve(batch):
    return bcops.host_resolve_barcodes(
        batch.bc_packed, batch.bc_qual, batch.slot_valid,
        wl.sorted_seqs, wl_counts, chem.barcode_length)
print(f"index load {time.time() - t0:.1f}s", flush=True)

step = _make_step(didx, ann_idx, chem, READ_LEN, accumulate=True)
ex = Executor(None)
acc = step.init_acc(max(4 * BATCH, 1 << 20), max(4 * BATCH, 1 << 18))

r1 = os.path.join(run_dir, "big_S1_L001_R1_001.fastq")
r2 = os.path.join(run_dir, "big_S1_L001_R2_001.fastq")
t_dec = t_res = t_pack = t_put = t_step = 0.0
window = []
n = 0
t_prev = time.time()
it = batches_from_fastqs(chem, r1, r2, BATCH, READ_LEN)
t_first = None
import jax
while n < n_batches:
    t1 = time.time()
    try:
        batch = next(it)
    except StopIteration:
        break
    t2 = time.time()
    bc_idx, hit, corrected, corr_bc = resolve(batch)
    t3 = time.time()
    buf = pack_step_input(chem, READ_LEN, batch, bc_idx)
    t4 = time.time()
    dbuf = ex.put(buf)
    t5 = time.time()
    acc = step(dbuf, acc, lib_tag=0)
    if t_first is None:
        import jax
        jax.block_until_ready(acc["mvec"])
        t_first = time.time() - t5
        print(f"compile+first step {t_first:.1f}s", flush=True)
        t6 = time.time()
    else:
        t6 = time.time()
    t_dec += t2 - t1
    t_res += t3 - t2
    t_pack += t4 - t3
    t_put += t5 - t4
    t_step += t6 - t5
    n += 1
    if n % 40 == 0:
        jax.block_until_ready(acc["mvec"])
        dt = time.time() - t_prev
        t_prev = time.time()
        window.append(dt)
        print(f"batch {n}: last-40 wall {dt:.2f}s "
              f"({40 * BATCH / dt / 1000:.0f}k reads/s) "
              f"cum: dec {t_dec:.1f} res {t_res:.1f} pack {t_pack:.1f} "
              f"put {t_put:.1f} step-dispatch {t_step:.1f}", flush=True)

jax.block_until_ready(acc["mvec"])
total = time.time() - t0
print(f"DONE {n} batches ({n * BATCH} reads) profile-total {total:.1f}s")
