"""Device RTL probe alignment — the Hurtle analog
(cr_types/src/probe_set.rs:300 align_probe_read), batched:

  * each read half (lhs = probe_len/2 bases, rhs after the odd-middle skip)
    packs into a (hi, lo) uint32 pair and binary-searches the sorted
    half-sequence tables; exact misses retry all 3*half_len 1-Hamming
    mutants (XOR trick), rejecting ambiguous (>1 distinct) mutant hits —
    probe_set.rs:254-296 align_half_read;
  * both halves hit: confident when they agree on a probe (identical-seq
    duplicates resolve to the lexicographically minimal probe id);
  * one half hit: the other half rescues by hamming the read bases against
    that probe's stored half sequence, requiring positive score and total
    >= transcriptome_min_score — probe_set.rs:358-421.

Gapped (indel) probe reads are NOT rescued here (the reference also treats
them as half matches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.probe_set import ProbeSet
from .dedup import lex3_search
from ..ops import encode


def _pack_half(codes: jnp.ndarray, length: int):
    """codes [B, length] -> (hi u32, lo u32) MSB-first, hi = first 16."""
    hi_len = min(length, 16)
    hi = jnp.zeros(codes.shape[:-1], jnp.uint32)
    for i in range(hi_len):
        hi = (hi << 2) | codes[..., i].astype(jnp.uint32)
    lo = jnp.zeros(codes.shape[:-1], jnp.uint32)
    for i in range(hi_len, length):
        lo = (lo << 2) | codes[..., i].astype(jnp.uint32)
    return hi, lo


def make_probe_aligner(ps: ProbeSet, read_len: int,
                       min_score: int | None = None):
    """Build the jitted probe alignment: (rna, nmask) -> dict(probe, gene,
    conf_mapped, score)."""
    (lhs_hi, lhs_lo, lhs_idx), (rhs_hi, rhs_lo, rhs_idx), half, rhs_start = \
        ps.half_tables()
    plen = ps.probe_len
    if min_score is None:
        min_score = int(ps.metadata.get("transcriptome_min_score", 30))
    hi_len = min(half, 16)
    lo_len = half - hi_len
    rhs_len = plen - rhs_start
    rhs_hi_len = min(rhs_len, 16)
    rhs_lo_len = rhs_len - rhs_hi_len

    # probe half sequences as dense code arrays for rescue hamming
    seq_codes = np.stack([encode.encode_str(s)[0] for s in ps.sequences])
    lhs_codes_d = jnp.asarray(seq_codes[:, :half])
    rhs_codes_d = jnp.asarray(seq_codes[:, rhs_start:])
    gene_of_probe = jnp.asarray(ps.probe_gene_idx)
    included = jnp.asarray(ps.included)

    tables = dict(
        lhs=(jnp.asarray(lhs_hi), jnp.asarray(lhs_lo), jnp.asarray(lhs_idx),
             hi_len, lo_len),
        rhs=(jnp.asarray(rhs_hi), jnp.asarray(rhs_lo), jnp.asarray(rhs_idx),
             rhs_hi_len, rhs_lo_len),
    )

    def half_lookup(codes, which, length):
        """codes [B, length] -> (probe int32 (-1 none/ambiguous), score)."""
        his, los, pidx, h_len, l_len = tables[which]
        zeros = jnp.zeros(codes.shape[0], jnp.uint32)
        hi, lo = _pack_half(codes, length)
        idx, found = lex3_search(his, los, jnp.zeros_like(his),
                                 hi, lo, jnp.zeros_like(hi))
        # exact hit: lexicographically-minimal duplicate = smallest probe
        # index among equal seqs; table sorted by (hi, lo, original order),
        # so take min over the run — approximate by first entry (tables are
        # built with stable order so first = smallest original index).
        exact_probe = jnp.where(found, pidx[idx], -1)
        # 1-Hamming mutants on hi and lo words
        muts = []
        for pos in range(length):
            if pos < h_len:
                shift = 2 * (h_len - 1 - pos)
                for d in (1, 2, 3):
                    muts.append((hi ^ (jnp.uint32(d) << shift), lo))
            else:
                shift = 2 * (l_len - 1 - (pos - h_len))
                for d in (1, 2, 3):
                    muts.append((hi, lo ^ (jnp.uint32(d) << shift)))
        mhi = jnp.stack([m[0] for m in muts], axis=1)   # [B, M]
        mlo = jnp.stack([m[1] for m in muts], axis=1)
        midx, mfound = lex3_search(his, los, jnp.zeros_like(his),
                                   mhi, mlo, jnp.zeros_like(mhi))
        mprobe = jnp.where(mfound, pidx[midx], -1)
        n_hits = mfound.sum(axis=1)
        first_probe = jnp.max(jnp.where(
            mfound & (jnp.cumsum(mfound, axis=1) == 1), mprobe, -1), axis=1)
        mut_probe = jnp.where(n_hits == 1, first_probe, -1)

        probe = jnp.where(found, exact_probe, mut_probe)
        score = jnp.where(found, length,
                          jnp.where(mut_probe >= 0, length - 2, 0))
        return probe, score.astype(jnp.int32)

    def rescue(read_half, probe, mapped_score, probe_codes, length):
        """Hamming the unmapped read half vs the mapped probe's half."""
        pc = probe_codes[jnp.maximum(probe, 0)]
        mm = (read_half != pc).sum(axis=1).astype(jnp.int32)
        score = length - 2 * mm
        ok = (probe >= 0) & (score > 0) & (mapped_score + score >= min_score)
        return ok, score

    @jax.jit
    def align(rna, nmask):
        B, L = rna.shape
        lhs = rna[:, :half]
        rhs = rna[:, rhs_start:rhs_start + rhs_len]
        lhs_ok = nmask[:, :half].all(axis=1)
        rhs_ok = nmask[:, rhs_start:rhs_start + rhs_len].all(axis=1)

        lp, ls = half_lookup(lhs, "lhs", half)
        rp, rs = half_lookup(rhs, "rhs", rhs_len)
        lp = jnp.where(lhs_ok, lp, -1)
        rp = jnp.where(rhs_ok, rp, -1)

        both = (lp >= 0) & (rp >= 0)
        agree = both & (lp == rp)
        # disagreement on probe but both mapped: reference keeps both halves
        # (not confident); we mark not confident
        l_only = (lp >= 0) & (rp < 0)
        r_only = (rp >= 0) & (lp < 0)
        l_rescue_ok, l_rescue_score = rescue(lhs, rp, rs, lhs_codes_d, half)
        r_rescue_ok, r_rescue_score = rescue(rhs, lp, ls, rhs_codes_d, rhs_len)

        probe = jnp.where(agree, lp,
                 jnp.where(l_only & r_rescue_ok, lp,
                  jnp.where(r_only & l_rescue_ok, rp, -1)))
        score = jnp.where(agree, ls + rs,
                 jnp.where(l_only & r_rescue_ok, ls + r_rescue_score,
                  jnp.where(r_only & l_rescue_ok, rs + l_rescue_score, 0)))
        conf = (probe >= 0) & (score >= min_score) & included[jnp.maximum(probe, 0)]
        gene = jnp.where(conf, gene_of_probe[jnp.maximum(probe, 0)], -1)
        return dict(probe=probe, gene=gene, conf_mapped=conf,
                    score=score, mapped=probe >= 0)

    return align
