"""Device seed-and-extend aligner (batched, fixed-shape, jit-compiled).

TPU-native replacement for the reference's in-process STAR alignment
(cr_lib/src/stages/align_and_count.rs:588-592, cr_lib/src/aligner.rs:396-422):
instead of one C++ suffix-array walk per read on a CPU thread, we align a
whole fixed-shape batch at once:

  1. rolling 2-bit k-mer extraction at static seed offsets (fwd + revcomp);
  2. k-mer lookup via a bucket-prefix table (top 22 bits -> row range) plus a
     short in-bucket binary search — ~4 HBM gathers per seed instead of a
     25-step global binary search;
  3. diagonal voting: per-read sort of candidate diagonals + scan-based
     run-length counting (no second search), top-k by multiplicity;
  4. ungapped local extension against genome windows gathered as packed
     32-bit words (16 bases/word, 13x fewer HBM touches than byte gathers),
     scored with Kadane max-substring via prefix scans — splice handling
     comes free from the index's junction contigs;
  5. canonicalized tie counting -> STAR MAPQ semantics
     (unique=255, 2 loci=3, 3-4=1, >4=0; rna_read.rs:32 HIGH_CONF_MAPQ).

All steps are jnp ops on static shapes — XLA fuses the scoring chain; the
only sequential structure is log-depth scans and the tiny in-bucket search.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from ..constants import DEFAULT_ALIGN_SCORE_MIN
from ..ops.hash_index import PROBE, HashTable
from .index import GenomeIndex

# Tunables (static); see align_and_count.rs:63 for the score floor.
SEED_STRIDE = 8       # extract a seed every N bases of the read
MAX_HITS_PER_SEED = 4  # hash-probe window = max hits surfaced per seed
MAX_CANDIDATES = 4    # diagonals taken to extension per strand


@register_dataclass
@dataclass(frozen=True)
class DeviceIndex:
    """GenomeIndex uploaded to device (replicated; one copy per chip).

    Registered as a jax pytree so the big arrays pass through jit as
    ARGUMENTS, not closure constants — captured constants get serialized
    into the compile payload (minutes of compile, and hard request-size
    limits on remote-compile setups)."""

    text_words: jnp.ndarray    # uint32 [G/16, 2] interleaved (codes, valid)
    kmer_hash: HashTable       # open-addressing (kmer -> position) table
    chrom_starts: jnp.ndarray  # int32 [C+1]
    sj_donor_abs: jnp.ndarray  # int32 [J] absolute text coord of donor end
    sj_acceptor_abs: jnp.ndarray  # int32 [J]
    genome_len: int = field(metadata=dict(static=True), default=0)
    text_len: int = field(metadata=dict(static=True), default=0)
    sj_overhang: int = field(metadata=dict(static=True), default=120)
    k: int = field(metadata=dict(static=True), default=16)

    @staticmethod
    def from_host(gi: GenomeIndex) -> "DeviceIndex":
        assert len(gi.text) < 2**31, (
            "int32 position space; shard the index for >2Gb genomes")
        return DeviceIndex(
            text_words=jnp.asarray(gi.packed_words()),
            kmer_hash=HashTable.build(gi.kmer_keys, gi.kmer_pos),
            chrom_starts=jnp.asarray(gi.chrom_starts.astype(np.int32)),
            sj_donor_abs=jnp.asarray(gi.sj_donor_end.astype(np.int32)),
            sj_acceptor_abs=jnp.asarray(gi.sj_acceptor_start.astype(np.int32)),
            genome_len=int(gi.genome_len),
            text_len=len(gi.text),
            sj_overhang=int(gi.sj_overhang),
            k=gi.k,
        )


def _rolling_kmers(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """codes uint8 [B, L] -> packed kmers uint32 [B, L-k+1] MSB-first."""
    B, L = codes.shape
    n = L - k + 1
    km = jnp.zeros((B, n), jnp.uint32)
    for i in range(k):
        km = (km << 2) | codes[:, i:i + n].astype(jnp.uint32)
    return km


def _window_valid(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """bool [B, L] -> [B, L-k+1]: all k bases valid (cumsum trick)."""
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))
    return (cs[:, k:] - cs[:, :-k]) == k




def make_aligner(idx: DeviceIndex, read_len: int,
                 score_min: int = DEFAULT_ALIGN_SCORE_MIN,
                 sw_rescue: bool = True, bind: bool = True):
    """Build the jitted batch alignment function for a static read length.

    sw_rescue: run the banded Smith-Waterman Pallas kernel on each read's
    best candidate window; reads whose gapped score clears `score_min` are
    rescued even when the ungapped pass fell short (indels), and the gapped
    score/end are reported for CIGAR refinement.
    """
    k = idx.k
    L = read_len
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    S = len(seed_offsets)
    H = MAX_HITS_PER_SEED
    D = MAX_CANDIDATES
    G = int(idx.text_len)
    NW = int(idx.text_words.shape[0])
    WIN_WORDS = (L + 15) // 16 + 1
    BIG = jnp.int32(2**31 - 1)

    contig_len = 2 * idx.sj_overhang

    def canonical_pos(idx, pos):
        """Map a text position to its genomic-equivalent absolute coordinate
        for distinct-locus counting: positions inside a junction contig's
        donor flank map to the same genomic coordinate as the direct genomic
        alignment, so an unspliced read hitting both is one locus."""
        if idx.sj_donor_abs.shape[0] == 0:
            return pos
        in_sj = pos >= idx.genome_len
        j = jnp.where(in_sj, (pos - idx.genome_len) // contig_len, 0)
        off = jnp.where(in_sj, (pos - idx.genome_len) % contig_len, 0)
        donor_start = idx.sj_donor_abs[j] - idx.sj_overhang
        acc = idx.sj_acceptor_abs[j]
        canon_sj = jnp.where(off < idx.sj_overhang,
                             donor_start + off,
                             acc + off - idx.sj_overhang)
        return jnp.where(in_sj, canon_sj, pos)

    def gather_windows(idx, pos, width=None):
        """pos int32 [...,] -> (codes uint8 [..., width], valid bool).

        Packed-word gathers + VARIABLE-SHIFT word realignment: aligned word
        j = (w[j] << 2*(pos&15)) | (w[j+1] >> 32-2*(pos&15)), so the unpack
        lands exactly at pos with no per-base take_along_axis (which costs
        ~12x more than the gather itself on TPU — a [B,D,112]->[B,D,91]
        gather is scalar-ish HBM traffic, shifts are pure VPU)."""
        width = width or L
        n_words = (width + 15) // 16 + 1
        w0 = pos >> 4
        extra = (1,) * pos.ndim
        widx = jnp.clip(w0[..., None] + jnp.arange(n_words).reshape(*extra, -1),
                        0, NW - 1)
        both = idx.text_words[widx]         # [..., n_words, 2] one gather
        words = both[..., 0]
        vwords = both[..., 1]

        off2 = (2 * (pos & 15)).astype(jnp.uint32)[..., None]
        hi = words[..., :-1] << off2
        lo = jnp.where(off2 == 0, jnp.uint32(0),
                       words[..., 1:] >> jnp.minimum(32 - off2, 31))
        aligned = hi | lo                    # [..., n_words-1], starts at pos
        off1 = ((pos & 15).astype(jnp.uint32))[..., None]
        vhi = (vwords[..., :-1] << off1) & jnp.uint32(0xFFFF)
        vlo = jnp.where(off1 == 0, jnp.uint32(0),
                        vwords[..., 1:] >> jnp.minimum(16 - off1, 15))
        valigned = vhi | vlo

        shifts = (2 * (15 - jnp.arange(16))).astype(jnp.uint32)
        codes16 = ((aligned[..., None] >> shifts) & 3).astype(jnp.uint8)
        vshifts = (15 - jnp.arange(16)).astype(jnp.uint32)
        valid16 = ((valigned[..., None] >> vshifts) & 1).astype(jnp.bool_)
        win = codes16.reshape(*pos.shape, (n_words - 1) * 16)[..., :width]
        wok = valid16.reshape(*pos.shape, (n_words - 1) * 16)[..., :width]
        in_bounds = (pos[..., None] + jnp.arange(width).reshape(*extra, -1)) < G
        return win, wok & in_bounds

    def align_strand(idx, codes, basemask):
        """codes [B, L] one strand; returns candidate (pos, score, start, len)
        arrays [B, D]."""
        B = codes.shape[0]
        kms = _rolling_kmers(codes, k)            # [B, L-k+1]
        kvalid = _window_valid(basemask, k)       # [B, L-k+1]
        km = kms[:, seed_offsets]                 # [B, S]
        kv = kvalid[:, seed_offsets]

        # one contiguous PROBE-window gather per seed (ops.hash_index)
        probe_hit, hit_pos = idx.kmer_hash.lookup(km, probe=H)  # [B, S, H]
        hit_ok = probe_hit & kv[:, :, None]
        diag = hit_pos.astype(jnp.int32) - seed_offsets[None, :, None]
        diag = jnp.where(hit_ok & (diag >= 0), diag, BIG)    # [B, S, H]

        flat = jnp.sort(diag.reshape(B, S * H), axis=1)      # [B, S*H]
        # run-length votes via prefix scans (no searchsorted)
        M = S * H
        pos_i = jnp.arange(M, dtype=jnp.int32)[None, :]
        new_run = jnp.concatenate(
            [jnp.ones((B, 1), bool), flat[:, 1:] != flat[:, :-1]], axis=1)
        run_start = jax.lax.cummax(jnp.where(new_run, pos_i, 0), axis=1)
        run_end = -jax.lax.cummax(
            jnp.where(jnp.concatenate(
                [new_run[:, 1:], jnp.ones((B, 1), bool)], axis=1),
                -pos_i, -(M - 1)), axis=1, reverse=True)
        votes = jnp.where(new_run & (flat != BIG),
                          run_end - run_start + 1, 0)
        top_votes, top_i = jax.lax.top_k(votes, D)           # [B, D]
        cand_pos = jnp.take_along_axis(flat, top_i, axis=1)  # [B, D]
        cand_ok = top_votes > 0

        # --- ungapped local extension (Kadane via prefix scans) ---
        win, wok = gather_windows(idx, jnp.where(cand_ok, cand_pos, 0))
        m = (win == codes[:, None, :]) & wok & basemask[:, None, :]
        active = basemask[:, None, :] & wok
        contrib = jnp.where(active, jnp.where(m, 1, -1), 0).astype(jnp.int32)
        cs = jnp.cumsum(contrib, axis=2)
        pref = jnp.pad(cs, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        run_min = jax.lax.cummax(-pref, axis=2)   # = -min prefix
        best_at = cs + run_min                    # [B, D, L] best sum ending at i
        score = jnp.max(best_at, axis=2)          # [B, D]
        end_i = jnp.argmax(best_at, axis=2)       # inclusive end index
        li = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        pref_masked = jnp.where(li <= end_i[:, :, None], pref, BIG)
        start_i = jnp.argmin(pref_masked, axis=2)
        aln_len = end_i - start_i + 1
        score = jnp.where(cand_ok, score, -BIG)
        return cand_pos, score, start_i.astype(jnp.int32), aln_len.astype(jnp.int32)

    @jax.jit
    def align_batch_impl(idx, rna, nmask):
        """rna uint8 [B, L], nmask bool [B, L] -> alignment dict. The index
        rides as a pytree argument so its arrays are runtime buffers, not
        compile-time constants."""
        B = rna.shape[0]
        rc = (3 - rna[:, ::-1]).astype(jnp.uint8)
        rc_mask = nmask[:, ::-1]

        # both strands as ONE [2B] batch: better fusion and one kernel chain
        both = jnp.concatenate([rna, rc], axis=0)
        bmask = jnp.concatenate([nmask, rc_mask], axis=0)
        pos2, sc2, st2, ln2 = align_strand(idx, both, bmask)      # [2B, D]

        pos = jnp.concatenate([pos2[:B], pos2[B:]], axis=1)  # [B, 2D]
        score = jnp.concatenate([sc2[:B], sc2[B:]], axis=1)
        start = jnp.concatenate([st2[:B], st2[B:]], axis=1)
        alen = jnp.concatenate([ln2[:B], ln2[B:]], axis=1)
        strand = jnp.concatenate(
            [jnp.zeros((B, D), jnp.int32), jnp.ones((B, D), jnp.int32)], axis=1)

        best_score = jnp.max(score, axis=1)                  # [B]
        is_best = score == best_score[:, None]
        canon = canonical_pos(idx, jnp.where(pos == BIG, 0, pos)) + start
        canon = jnp.where(is_best & (score > -BIG), canon, BIG)
        canon_sorted = jnp.sort(canon, axis=1)
        distinct = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             canon_sorted[:, 1:] != canon_sorted[:, :-1]], axis=1)
        n_best = jnp.sum(jnp.where(distinct & (canon_sorted != BIG), 1, 0), axis=1)

        # deterministic pick among ties: smallest (canon, strand) — stable
        order_key = canon * 2 + strand
        order_key = jnp.where(is_best, order_key, BIG)
        pick = jnp.argmin(order_key, axis=1)
        take = lambda a: jnp.take_along_axis(a, pick[:, None], axis=1)[:, 0]

        best_pos = take(pos)
        best_strand = take(strand)
        # second-best DISTINCT locus (for multimapper gene promotion,
        # read.rs:117-149): smallest (canon, strand) among best-scoring
        # candidates at a different canonical position
        canon_best = jnp.take_along_axis(canon, pick[:, None], axis=1)
        order_key2 = jnp.where(is_best & (canon != canon_best), order_key, BIG)
        pick2 = jnp.argmin(order_key2, axis=1)
        take2 = lambda a: jnp.take_along_axis(a, pick2[:, None], axis=1)[:, 0]
        out = dict(
            pos=best_pos, strand=best_strand, score=best_score,
            aln_start=take(start), aln_len=take(alen), n_best=n_best,
            pos2=take2(pos), strand2=take2(strand),
            aln_start2=take2(start), aln_len2=take2(alen),
            has_second=take2(order_key2) < BIG,
        )

        if sw_rescue:
            from .sw import BAND, banded_sw
            codes_b = jnp.where(best_strand[:, None] == 1, rc, rna)
            mask_b = jnp.where(best_strand[:, None] == 1, rc_mask, nmask)
            win_start = jnp.maximum(best_pos - BAND // 2, 0)
            win, wok = gather_windows(idx, win_start, width=L + BAND)
            sw_score, sw_ei, sw_ed = banded_sw(codes_b, mask_b, win, wok)
            eff_score = jnp.maximum(best_score, sw_score)
            out.update(sw_score=sw_score, sw_end_i=sw_ei, sw_end_d=sw_ed,
                       sw_win_start=win_start)
        else:
            eff_score = best_score

        mapped = (eff_score >= score_min) & (n_best >= 1)
        mapq = jnp.select(
            [n_best <= 1, n_best == 2, n_best <= 4],
            [jnp.int32(255), jnp.int32(3), jnp.int32(1)], jnp.int32(0))
        out["mapq"] = jnp.where(mapped, mapq, 0)
        out["mapped"] = mapped
        return out

    if not bind:
        # unbound form: caller passes the index per call, keeping it an
        # argument (not a constant) of any OUTER jit that inlines this
        return align_batch_impl

    def align_batch(rna, nmask):
        return align_batch_impl(idx, rna, nmask)

    return align_batch
