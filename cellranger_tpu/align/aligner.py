"""Device seed-and-extend aligner (batched, fixed-shape, jit-compiled).

TPU-native replacement for the reference's in-process STAR alignment
(cr_lib/src/stages/align_and_count.rs:588-592, cr_lib/src/aligner.rs:396-422):
instead of one C++ suffix-array walk per read on a CPU thread, we align a
whole fixed-shape batch at once:

  1. rolling 2-bit k-mer extraction at static seed offsets (fwd + revcomp);
  2. vectorized binary search of seeds against the sorted k-mer index in HBM;
  3. diagonal voting (sort + rank counting) to shortlist candidate loci;
  4. ungapped local extension (Kadane max-substring via cummax/cummin over a
     +match/-mismatch profile) against gathered genome windows — splice
     handling comes free from the index's junction contigs;
  5. canonicalized tie counting -> STAR MAPQ semantics
     (unique=255, 2 loci=3, 3-4=1, >4=0; rna_read.rs:32 HIGH_CONF_MAPQ).

Indels are refined by the banded Smith-Waterman Pallas kernel (align.sw)
for reads whose ungapped score falls below the accept threshold.

All steps are jnp ops on static shapes — XLA fuses the scoring chain; the
only sequential structure is log-depth scans. No per-read control flow.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_ALIGN_SCORE_MIN
from .index import GenomeIndex

# Tunables (static); see align_and_count.rs:63 for the score floor.
SEED_STRIDE = 6       # extract a seed every N bases of the read
MAX_HITS_PER_SEED = 4
MAX_CANDIDATES = 4    # diagonals taken to extension per strand
WINDOW_PAD = 0        # extra bases gathered around the window (ungapped: 0)


@dataclass(frozen=True)
class DeviceIndex:
    """GenomeIndex uploaded to device (replicated; one copy per chip)."""

    text: jnp.ndarray          # uint8 [G]
    text_valid: jnp.ndarray    # bool [G]
    kmer_keys: jnp.ndarray     # uint32 [P] sorted
    kmer_pos: jnp.ndarray      # uint32 [P]
    chrom_starts: jnp.ndarray  # int32 [C+1]
    genome_len: int
    sj_overhang: int
    sj_donor_abs: jnp.ndarray  # int32 [J] absolute text coord of donor end
    sj_acceptor_abs: jnp.ndarray  # int32 [J]
    k: int

    @staticmethod
    def from_host(gi: GenomeIndex) -> "DeviceIndex":
        assert len(gi.text) < 2**31, (
            "int32 position space; shard the index for >2Gb genomes")
        return DeviceIndex(
            text=jnp.asarray(gi.text),
            text_valid=jnp.asarray(gi.text_valid),
            kmer_keys=jnp.asarray(gi.kmer_keys),
            kmer_pos=jnp.asarray(gi.kmer_pos.astype(np.int32)),
            chrom_starts=jnp.asarray(gi.chrom_starts.astype(np.int32)),
            genome_len=int(gi.genome_len),
            sj_overhang=int(gi.sj_overhang),
            sj_donor_abs=jnp.asarray(gi.sj_donor_end.astype(np.int32)),
            sj_acceptor_abs=jnp.asarray(gi.sj_acceptor_start.astype(np.int32)),
            k=gi.k,
        )


@dataclass
class AlignmentResult:
    """Per-read best alignment (all [B] unless noted)."""

    pos: jnp.ndarray        # int32 text position of window start (clip incl.)
    strand: jnp.ndarray     # int32 0=fwd 1=revcomp
    score: jnp.ndarray      # int32 best local score
    aln_start: jnp.ndarray  # int32 read offset of aligned region (fwd-read coords after strand flip)
    aln_len: jnp.ndarray    # int32 aligned length
    mapq: jnp.ndarray       # int32
    mapped: jnp.ndarray     # bool score >= min and any candidate
    n_best: jnp.ndarray     # int32 number of distinct best-scoring loci


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


def make_aligner(idx: DeviceIndex, read_len: int, score_min: int = DEFAULT_ALIGN_SCORE_MIN):
    """Build the jitted batch alignment function for a static read length."""
    k = idx.k
    L = read_len
    seed_offsets = np.arange(0, L - k + 1, SEED_STRIDE, dtype=np.int32)
    S = len(seed_offsets)
    H = MAX_HITS_PER_SEED
    D = MAX_CANDIDATES
    G = int(idx.text.shape[0])
    BIG = jnp.int32(2**31 - 1)

    contig_len = 2 * idx.sj_overhang

    def canonical_pos(pos):
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

    def align_strand(codes, basemask):
        """codes [B, L] one strand; returns candidate (pos, score, start, len)
        arrays [B, D] + per-candidate valid."""
        B = codes.shape[0]
        kms = _rolling_kmers(codes, k)            # [B, L-k+1]
        kvalid = _window_valid(basemask, k)       # [B, L-k+1]
        km = kms[:, seed_offsets]                 # [B, S]
        kv = kvalid[:, seed_offsets]

        lo = jnp.searchsorted(idx.kmer_keys, km.reshape(-1)).reshape(B, S)
        hi = jnp.searchsorted(idx.kmer_keys, km.reshape(-1), side="right").reshape(B, S)
        n_hits = hi - lo
        h = jnp.arange(H, dtype=jnp.int32)
        hit_idx = lo[:, :, None] + h[None, None, :]          # [B, S, H]
        hit_ok = (h[None, None, :] < n_hits[:, :, None]) & kv[:, :, None]
        hit_pos = idx.kmer_pos[jnp.clip(hit_idx, 0, idx.kmer_pos.shape[0] - 1)]
        # diagonal = candidate window start = hit_pos - seed_offset
        diag = hit_pos - seed_offsets[None, :, None]
        diag = jnp.where(hit_ok & (diag >= 0), diag, BIG)    # [B, S, H]

        flat = jnp.sort(diag.reshape(B, S * H), axis=1)      # [B, S*H]
        # votes per distinct diagonal via rank difference
        vs = jax.vmap(lambda a: jnp.searchsorted(a, a, side="right")
                      - jnp.searchsorted(a, a, side="left"))(flat)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), flat[:, 1:] != flat[:, :-1]], axis=1)
        votes = jnp.where(first & (flat != BIG), vs, 0)
        top_votes, top_i = jax.lax.top_k(votes, D)           # [B, D]
        cand_pos = jnp.take_along_axis(flat, top_i, axis=1)  # [B, D]
        cand_ok = top_votes > 0

        # --- ungapped local extension (Kadane via prefix scans) ---
        gather_idx = jnp.clip(cand_pos[:, :, None]
                              + jnp.arange(L, dtype=jnp.int32)[None, None, :], 0, G - 1)
        win = idx.text[gather_idx]                # [B, D, L]
        win_ok = idx.text_valid[gather_idx]
        in_bounds = (cand_pos[:, :, None] + jnp.arange(L)[None, None, :]) < G
        m = (win == codes[:, None, :]) & win_ok & in_bounds & basemask[:, None, :]
        active = basemask[:, None, :] & in_bounds
        contrib = jnp.where(active, jnp.where(m, 1, -1), 0).astype(jnp.int32)
        cs = jnp.cumsum(contrib, axis=2)
        run_min = jax.lax.cummax(jnp.zeros_like(cs) - jnp.pad(
            cs, ((0, 0), (0, 0), (1, 0)))[:, :, :-1], axis=2)  # = -min prefix
        best_at = cs + run_min                    # [B, D, L] best sum ending at i
        score = jnp.max(best_at, axis=2)          # [B, D]
        end_i = jnp.argmax(best_at, axis=2)       # inclusive end index
        # start index: position after the minimizing prefix
        pref = jnp.pad(cs, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        # index of min prefix among 0..end_i: recompute via masked argmin
        li = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        pref_masked = jnp.where(li <= end_i[:, :, None], pref, BIG)
        start_i = jnp.argmin(pref_masked, axis=2)
        aln_len = end_i - start_i + 1
        score = jnp.where(cand_ok, score, -BIG)
        return cand_pos, score, start_i.astype(jnp.int32), aln_len.astype(jnp.int32)

    @jax.jit
    def align_batch(rna, nmask):
        """rna uint8 [B, L], nmask bool [B, L] -> AlignmentResult arrays."""
        B = rna.shape[0]
        rc = (3 - rna[:, ::-1]).astype(jnp.uint8)
        rc_mask = nmask[:, ::-1]

        pos_f, sc_f, st_f, ln_f = align_strand(rna, nmask)
        pos_r, sc_r, st_r, ln_r = align_strand(rc, rc_mask)

        pos = jnp.concatenate([pos_f, pos_r], axis=1)        # [B, 2D]
        score = jnp.concatenate([sc_f, sc_r], axis=1)
        start = jnp.concatenate([st_f, st_r], axis=1)
        alen = jnp.concatenate([ln_f, ln_r], axis=1)
        strand = jnp.concatenate(
            [jnp.zeros((B, pos_f.shape[1]), jnp.int32),
             jnp.ones((B, pos_r.shape[1]), jnp.int32)], axis=1)

        best_score = jnp.max(score, axis=1)                  # [B]
        is_best = score == best_score[:, None]
        canon = canonical_pos(jnp.where(pos == BIG, 0, pos)) + start
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

        mapped = (best_score >= score_min) & (n_best >= 1)
        mapq = jnp.select(
            [n_best <= 1, n_best == 2, n_best <= 4],
            [jnp.int32(255), jnp.int32(3), jnp.int32(1)], jnp.int32(0))
        mapq = jnp.where(mapped, mapq, 0)
        return dict(
            pos=take(pos), strand=take(strand), score=best_score,
            aln_start=take(start), aln_len=take(alen),
            mapq=mapq, mapped=mapped, n_best=n_best,
        )

    return align_batch
