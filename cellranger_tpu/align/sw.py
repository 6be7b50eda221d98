"""Banded Smith-Waterman Pallas kernel.

Refines candidate loci with gapped local alignment (the role STAR's
stitched-seed extension plays in the reference, cr_lib/src/aligner.rs:396):
the ungapped Kadane pass (aligner.py) handles substitution-only reads; reads
with indels score low there and are rescued here.

Kernel design (TPU-first):
  * batch of reads vs per-read genome windows, both transposed so the BAND
    axis lives on sublanes and READS on lanes: every DP step is a
    [BAND, TILE_READS] VPU op.
  * banded DP over read positions i: B[i][d] = H[i][i+d] for band offset
    d in [0, BAND). Diagonal move keeps d, vertical (read-consuming gap)
    reads d+1 of the previous row, horizontal (window-consuming gap) is a
    max-plus prefix scan within the row: hscan[d] = max_{d'<=d} pre[d'] -
    gp*(d-d') = cummax(pre + gp*idx) - gp*idx — one cummax per row instead
    of a sequential in-row loop.
  * linear gap penalty (SW_GAP_EXTEND); local alignment (floor at 0);
    running (best, end_i, end_d) tracked per read.

Traceback for CIGARs is data-dependent pointer chasing — hostile to SIMD —
so the kernel returns (score, end_i, end_d) and the few reads whose gapped
score beats their ungapped score get a tiny host DP for the CIGAR
(pipeline/bam_out wiring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import SW_MATCH_SCORE, SW_MISMATCH_SCORE, SW_GAP_EXTEND

TILE_READS = 128
BAND = 16
GAP = -SW_GAP_EXTEND  # positive penalty
NEG = -(1 << 20)


def _sw_kernel(read_ref, rmask_ref, win_ref, wmask_ref,
               score_ref, endi_ref, endd_ref):
    """One tile: read_ref [L, T] int32 codes, win_ref [W, T], masks int32.
    W = L + BAND. Outputs [1, T] int32 each."""
    L = read_ref.shape[0]
    T = read_ref.shape[1]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BAND, T), 0)
    gp_d = GAP * d_idx

    def body(i, carry):
        h_prev, best, bi, bd = carry
        r = read_ref[i, :][None, :]                       # [1, T]
        rm = rmask_ref[i, :][None, :]
        w = win_ref[pl.ds(i, BAND), :]                    # [BAND, T]
        wm = wmask_ref[pl.ds(i, BAND), :]
        active = (rm > 0) & (wm > 0)
        s = jnp.where(w == r, SW_MATCH_SCORE, SW_MISMATCH_SCORE)
        s = jnp.where(active, s, NEG)
        diag = h_prev + s
        vert = jnp.concatenate(
            [h_prev[1:], jnp.full((1, T), NEG, jnp.int32)], axis=0) - GAP
        pre = jnp.maximum(jnp.maximum(diag, vert), 0)
        # horizontal max-plus prefix scan along the band axis: hscan[d] =
        # max_{d'<=d} pre[d'] - GAP*(d-d'), via log-doubling shifted maxima
        # (portable inside pallas, unlike cummax)
        t = pre + gp_d
        sh = 1
        while sh < BAND:
            shifted = jnp.concatenate(
                [jnp.full((sh, T), NEG, jnp.int32), t[:-sh]], axis=0)
            t = jnp.maximum(t, shifted)
            sh *= 2
        h_cur = t - gp_d
        h_cur = jnp.where(active, h_cur, 0)
        # best-of-row with index: pack d into low bits (Mosaic has no int
        # argmax); smaller d wins ties
        packed = h_cur * BAND + (BAND - 1 - d_idx)
        row_packed = jnp.max(packed, axis=0)              # [T]
        row_best = row_packed // BAND
        row_d = (BAND - 1) - (row_packed % BAND)
        better = row_best > best
        best = jnp.where(better, row_best, best)
        bi = jnp.where(better, i, bi)
        bd = jnp.where(better, row_d, bd)
        return h_cur, best, bi, bd

    h0 = jnp.zeros((BAND, T), jnp.int32)
    best0 = jnp.zeros((T,), jnp.int32)
    z = jnp.zeros((T,), jnp.int32)
    _, best, bi, bd = jax.lax.fori_loop(0, L, body, (h0, best0, z, z))
    score_ref[0, :] = best
    endi_ref[0, :] = bi
    endd_ref[0, :] = bd


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_sw(read_codes, read_mask, win_codes, win_mask, interpret=None):
    """Batched banded SW.

    read_codes uint8 [B, L]; win_codes uint8 [B, W] with W = L + BAND
    (window starts BAND//2 before the candidate diagonal so indels in both
    directions stay in band). Returns (score, end_i, end_d) int32 [B].
    """
    B, L = read_codes.shape
    W = win_codes.shape[1]
    assert W == L + BAND, (W, L)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nt = (B + TILE_READS - 1) // TILE_READS
    pad = nt * TILE_READS - B

    def prep(x, width):
        x = jnp.pad(x.astype(jnp.int32), ((0, pad), (0, 0)))
        return x.T  # [width, B']

    rt = prep(read_codes, L)
    rm = prep(read_mask, L)
    wt = prep(win_codes, W)
    wm = prep(win_mask, W)

    grid = (nt,)
    specs = lambda rows: pl.BlockSpec((rows, TILE_READS),
                                      lambda t: (0, t),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TILE_READS), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    score, endi, endd = pl.pallas_call(
        _sw_kernel,
        grid=grid,
        in_specs=[specs(L), specs(L), specs(W), specs(W)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((1, nt * TILE_READS), jnp.int32),) * 3,
        interpret=interpret,
    )(rt, rm, wt, wm)
    return score[0, :B], endi[0, :B], endd[0, :B]


def sw_traceback_host(read: np.ndarray, rmask: np.ndarray,
                      win: np.ndarray, wmask: np.ndarray):
    """Host DP + traceback for one read (CIGAR refinement of indel reads).

    Returns (score, cigar [(len, op)] with ops M/I/D/S, read_start,
    win_start). Same scoring as the kernel (linear gaps).
    """
    L = len(read)
    W = len(win)
    H = np.zeros((L + 1, W + 1), np.int32)
    ptr = np.zeros((L + 1, W + 1), np.int8)  # 0 stop, 1 diag, 2 up(I), 3 left(D)
    best, bi, bj = 0, 0, 0
    # same band as the kernel: window position j in [i, i + BAND)
    for i in range(1, L + 1):
        if not rmask[i - 1]:
            continue
        for j in range(max(1, i), min(W + 1, i + BAND)):
            if not wmask[j - 1]:
                continue
            s = SW_MATCH_SCORE if read[i - 1] == win[j - 1] else SW_MISMATCH_SCORE
            cands = (H[i - 1, j - 1] + s, H[i - 1, j] - GAP, H[i, j - 1] - GAP, 0)
            k = int(np.argmax(cands))
            v = cands[k]
            H[i, j] = v
            ptr[i, j] = (1, 2, 3, 0)[k] if v > 0 else 0
            if v > best:
                best, bi, bj = v, i, j
    # traceback
    ops = []
    i, j = bi, bj
    while i > 0 and j > 0 and ptr[i, j] != 0:
        p = ptr[i, j]
        if p == 1:
            ops.append("M"); i -= 1; j -= 1
        elif p == 2:
            ops.append("I"); i -= 1
        else:
            ops.append("D"); j -= 1
    ops.reverse()
    cigar = []
    for op in ops:
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + 1, op)
        else:
            cigar.append((1, op))
    return int(best), cigar, i, j
