"""Gene annotation of alignments: device-friendly re-design of the
reference's TranscriptAnnotator (lib/rust/tx_annotation/src/transcript.rs:268,
annotate_alignment :311-434, align_to_transcript :436-571).

Semantics matched:
  * per-transcript region: EXONIC if a splice segment of the read has >= 50%
    overlap with some exon (region_min_overlap, transcript.rs is_read_exonic);
    INTRONIC if not exonic but contained in the transcript span; else
    intergenic. Read-level region = max-priority across transcripts
    (exonic > intronic > intergenic).
  * sense/antisense: chemistry_strandedness '+': antisense iff read strand !=
    transcript strand; '-': antisense iff equal (transcript.rs:478-482).
  * counted genes = distinct genes with sense exonic/intronic alignments
    (include-introns mode, the reference default since CR7); a read is
    confidently mapped to the transcriptome when MAPQ==255 and exactly one
    distinct gene (read.rs:129).

Device formulation: no per-read transcript loops — a read probes the sorted
exon/transcript interval tables with binary search and examines a static
window of W neighbors (vectorized gather + masked reduction). Reads aligned
to junction contigs take a precomputed per-junction gene/strand (their exonic
status is implied by construction of the contig).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from ..constants import REGION_MIN_OVERLAP
from ..io.gtf import Transcriptome
from .index import GenomeIndex

EXON_WINDOW = 16    # sorted-neighbor exons examined per read
TX_WINDOW = 8       # sorted-neighbor transcripts examined per read

REGION_EXONIC = 0
REGION_INTRONIC = 1
REGION_INTERGENIC = 2

GENE_NONE = -1
GENE_MULTI = -2


@register_dataclass
@dataclass(frozen=True)
class AnnotationIndex:
    """Device arrays for annotation (absolute text coordinates).
    A jax pytree: arrays pass through jit as arguments (n_genes static)."""

    # exons sorted by start
    ex_start: jnp.ndarray   # int32 [E]
    ex_end: jnp.ndarray     # int32 [E]
    ex_gene: jnp.ndarray    # int32 [E]
    ex_strand: jnp.ndarray  # int32 [E] 0=+ 1=-
    ex_cummax_end: jnp.ndarray  # int32 [E] running max of ex_end
    # transcripts sorted by start
    tx_start: jnp.ndarray
    tx_end: jnp.ndarray
    tx_gene: jnp.ndarray
    tx_strand: jnp.ndarray
    tx_cummax_end: jnp.ndarray
    # junction contig annotation
    sj_gene: jnp.ndarray    # int32 [J] gene id or GENE_MULTI
    sj_strand: jnp.ndarray  # int32 [J]
    n_genes: int = field(metadata=dict(static=True), default=0)

    @staticmethod
    def build(txome: Transcriptome, gi: GenomeIndex) -> "AnnotationIndex":
        cidx = {n: i for i, n in enumerate(gi.chrom_names)}
        exs, exe, exg, exs_strand = [], [], [], []
        txs, txe, txg, txstr = [], [], [], []
        for t in txome.transcripts:
            if t.chrom not in cidx:
                continue
            c0 = int(gi.chrom_starts[cidx[t.chrom]])
            strand = 0 if t.strand == "+" else 1
            txs.append(c0 + t.start)
            txe.append(c0 + t.end)
            txg.append(t.gene_index)
            txstr.append(strand)
            for (s, e) in t.exons:
                exs.append(c0 + s)
                exe.append(c0 + e)
                exg.append(t.gene_index)
                exs_strand.append(strand)

        def sort_by_start(start, *arrs):
            start = np.asarray(start, np.int64)
            order = np.argsort(start, kind="stable")
            out = [start[order].astype(np.int32)]
            for a in arrs:
                out.append(np.asarray(a)[order].astype(np.int32))
            return out

        ex_start, ex_end, ex_gene, ex_strand = sort_by_start(exs, exe, exg, exs_strand)
        tx_start, tx_end, tx_gene, tx_strand = sort_by_start(txs, txe, txg, txstr)
        ex_cummax = np.maximum.accumulate(ex_end) if len(ex_end) else ex_end
        tx_cummax = np.maximum.accumulate(tx_end) if len(tx_end) else tx_end

        # junction annotation: distinct genes/strands of transcripts sharing it
        sj_keys = sorted(txome.junctions().items())
        j_gene, j_strand = [], []
        txl = txome.transcripts
        kept = {(gi.chrom_names[gi.sj_chrom[i]],
                 int(gi.sj_donor_end[i] - gi.chrom_starts[gi.sj_chrom[i]]),
                 int(gi.sj_acceptor_start[i] - gi.chrom_starts[gi.sj_chrom[i]]))
                for i in range(gi.n_junctions)}
        by_key = {k: v for k, v in sj_keys}
        for i in range(gi.n_junctions):
            key = (gi.chrom_names[gi.sj_chrom[i]],
                   int(gi.sj_donor_end[i] - gi.chrom_starts[gi.sj_chrom[i]]),
                   int(gi.sj_acceptor_start[i] - gi.chrom_starts[gi.sj_chrom[i]]))
            tids = by_key.get(key, [])
            genes = {txl[t].gene_index for t in tids}
            strands = {txl[t].strand for t in tids}
            j_gene.append(genes.pop() if len(genes) == 1 else GENE_MULTI)
            j_strand.append(0 if strands == {"+"} else (1 if strands == {"-"} else 0))

        return AnnotationIndex(
            ex_start=jnp.asarray(ex_start), ex_end=jnp.asarray(ex_end),
            ex_gene=jnp.asarray(ex_gene), ex_strand=jnp.asarray(ex_strand),
            ex_cummax_end=jnp.asarray(ex_cummax),
            tx_start=jnp.asarray(tx_start), tx_end=jnp.asarray(tx_end),
            tx_gene=jnp.asarray(tx_gene), tx_strand=jnp.asarray(tx_strand),
            tx_cummax_end=jnp.asarray(tx_cummax),
            sj_gene=jnp.asarray(np.asarray(j_gene, np.int32)),
            sj_strand=jnp.asarray(np.asarray(j_strand, np.int32)),
            n_genes=len(txome.genes),
        )


def _window_hits(starts, ends, cummax_end, s, e, W):
    """For query intervals [s,e): indices [B,W] of the last W table rows with
    start < e, plus overlap validity (end > s and the row actually overlaps)."""
    B = s.shape[0]
    N = starts.shape[0]
    hi = jnp.searchsorted(starts, e - 1, side="right")  # rows with start < e
    w = jnp.arange(W, dtype=jnp.int32)
    idx = hi[:, None] - 1 - w[None, :]                  # scan back
    ok = idx >= 0
    idx_c = jnp.clip(idx, 0, max(N - 1, 0))
    ov = ok & (ends[idx_c] > s[:, None])
    # stop early: if cummax_end at idx already < s, no further-left row overlaps
    reachable = ok & (cummax_end[idx_c] > s[:, None])
    return idx_c, ov & reachable


def make_annotator(ann: AnnotationIndex, gi_genome_len: int, sj_overhang: int,
                   chemistry_strandedness: str = "+", bind: bool = True):
    """Build jitted annotate(pos, aln_len, strand, mapq, mapped) -> dict."""
    contig_len = 2 * sj_overhang
    n_sj = int(ann.sj_gene.shape[0])
    flip = 0 if chemistry_strandedness == "+" else 1

    @jax.jit
    def annotate_impl(ann, pos, aln_len, strand, mapq, mapped):
        B = pos.shape[0]
        s = pos
        e = pos + aln_len
        alen = aln_len

        # ---- genomic alignments: exon window probe ----
        if ann.ex_start.shape[0] > 0:
            eidx, eov = _window_hits(ann.ex_start, ann.ex_end, ann.ex_cummax_end,
                                     s, e, EXON_WINDOW)
            ov_len = (jnp.minimum(ann.ex_end[eidx], e[:, None])
                      - jnp.maximum(ann.ex_start[eidx], s[:, None]))
            exonic_hit = eov & (ov_len.astype(jnp.float32)
                                >= REGION_MIN_OVERLAP * alen[:, None].astype(jnp.float32))
            # sense: antisense iff (read_strand != tx_strand) xor chem'-'
            ex_sense = (ann.ex_strand[eidx] == strand[:, None]) ^ (flip == 1)
            exonic_sense = exonic_hit & ex_sense
            any_exonic = exonic_hit.any(axis=1)
            ex_genes = jnp.where(exonic_sense, ann.ex_gene[eidx], GENE_NONE)
        else:
            any_exonic = jnp.zeros(B, bool)
            ex_genes = jnp.full((B, EXON_WINDOW), GENE_NONE, jnp.int32)

        if ann.tx_start.shape[0] > 0:
            tidx, tov = _window_hits(ann.tx_start, ann.tx_end, ann.tx_cummax_end,
                                     s, e, TX_WINDOW)
            tx_sense = (ann.tx_strand[tidx] == strand[:, None]) ^ (flip == 1)
            # intronic requires full containment in the transcript span
            # (transcript.rs:462-463 get_overlap >= 1.0)
            intronic_hit = tov & (ann.tx_start[tidx] <= s[:, None]) \
                & (ann.tx_end[tidx] >= e[:, None])
            any_intronic = intronic_hit.any(axis=1)
            in_genes = jnp.where(intronic_hit & tx_sense, ann.tx_gene[tidx], GENE_NONE)
        else:
            any_intronic = jnp.zeros(B, bool)
            in_genes = jnp.full((B, TX_WINDOW), GENE_NONE, jnp.int32)

        # Gene priority (transcript.rs:376-404): transcriptomic (exonic) sense
        # genes win; intronic sense genes count only when no exonic-sense hit
        # exists (include-introns mode).
        any_ex_sense = (ex_genes != GENE_NONE).any(axis=1)
        genes_all = jnp.where(
            any_ex_sense[:, None],
            jnp.concatenate([ex_genes,
                             jnp.full_like(in_genes, GENE_NONE)], axis=1),
            jnp.concatenate([jnp.full_like(ex_genes, GENE_NONE), in_genes], axis=1))
        gs = jnp.sort(genes_all, axis=1)
        is_gene = gs != GENE_NONE
        distinct = jnp.concatenate(
            [jnp.ones((B, 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1) & is_gene
        n_genes = distinct.sum(axis=1)
        first_gene = jnp.max(jnp.where(is_gene, gs, GENE_NONE), axis=1)  # any gene
        gene_genomic = jnp.where(
            n_genes == 1, first_gene, jnp.where(n_genes > 1, GENE_MULTI, GENE_NONE))
        region_genomic = jnp.where(
            any_exonic, REGION_EXONIC,
            jnp.where(any_intronic, REGION_INTRONIC, REGION_INTERGENIC))
        # antisense flag: no sense gene but an antisense one exists
        any_sense = n_genes > 0
        if ann.ex_start.shape[0] > 0:
            anti_ex = (exonic_hit & ~ex_sense).any(axis=1)
        else:
            anti_ex = jnp.zeros(B, bool)
        antisense_genomic = ~any_sense & anti_ex

        # ---- junction-contig alignments ----
        in_sj = pos >= gi_genome_len
        if n_sj > 0:
            j = jnp.clip(jnp.where(in_sj, (pos - gi_genome_len) // contig_len, 0),
                         0, n_sj - 1)
            sjg = ann.sj_gene[j]
            sj_sense = (ann.sj_strand[j] == strand) ^ (flip == 1)
            gene_sj = jnp.where(sj_sense & (sjg >= 0), sjg, GENE_NONE)
            anti_sj = ~sj_sense
        else:
            gene_sj = jnp.full(B, GENE_NONE, jnp.int32)
            anti_sj = jnp.zeros(B, bool)

        gene = jnp.where(in_sj, gene_sj, gene_genomic)
        region = jnp.where(in_sj, REGION_EXONIC, region_genomic)
        antisense = jnp.where(in_sj, anti_sj, antisense_genomic)

        conf_mapped = mapped & (mapq == 255) & (gene >= 0)
        return dict(gene=gene, region=region, antisense=antisense,
                    conf_mapped=conf_mapped)

    if not bind:
        return annotate_impl

    def annotate(pos, aln_len, strand, mapq, mapped):
        return annotate_impl(ann, pos, aln_len, strand, mapq, mapped)

    return annotate
