"""Position-sorted BAM assembly for the count pipeline — the WRITE_POS_BAM
analog (lib/rust/cr_lib/src/stages/write_pos_bam.rs), without the
samtools-cat subprocess: per-batch alignment arrays are collected on host,
argsorted by (chrom, pos) once, and streamed through the pure-python BGZF
writer.

Tag semantics (cr_bam/src/bam_tags.rs): CR/CY always; CB only when the
barcode is on the whitelist (possibly corrected); UR/UY always; UB for valid
UMIs (corrected per the dedup map); GX/GN + RE on mapped reads; xf flags
mark conf-mapped / UMI-count / dup reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bam import (BAM_CMATCH, BAM_CREF_SKIP, BAM_CSOFT_CLIP,
                      FLAG_REVERSE, FLAG_UNMAPPED, XF_CONF_MAPPED, XF_DUP,
                      XF_LOW_SUPPORT_UMI, XF_UMI_COUNT)
from ..io.bam_index import IndexingBamWriter as BamWriter
from ..io.gtf import Transcriptome
from ..ops import encode
from ..align.index import GenomeIndex

REGION_CHARS = {0: "E", 1: "I", 2: "N"}


@dataclass
class BamCollector:
    """Accumulates per-batch host arrays until the final sorted write."""

    gi: GenomeIndex
    txome: Transcriptome
    chunks: list[dict] = field(default_factory=list)

    def add_batch(self, batch, step_out: dict):
        n = batch.n_reads
        take = lambda a: np.asarray(a)[:n]
        self.chunks.append(dict(
            names=batch.names[:n] if batch.names else
                  [b"read%d" % i for i in batch.read_id[:n]],
            rna=take(batch.rna), rna_qual=take(batch.rna_qual),
            rna_len=take(batch.rna_len), nmask=take(batch.rna_nmask),
            bc_packed=take(batch.bc_packed), bc_qual=take(batch.bc_qual),
            umi_packed=take(batch.umi_packed), umi_valid=take(batch.umi_valid),
            umi_qual=take(batch.umi_qual),
            pos=take(step_out["pos"]), mapq=take(step_out["mapq"]),
            strand=take(step_out["strand"]), aln_len=take(step_out["aln_len"]),
            aln_start=take(step_out["aln_start"]),
            mapped=take(step_out["mapped"]),
            region=take(step_out["region"]), gene=take(step_out["gene"]),
            conf_ok=take(step_out["conf_ok"]), bc_ok=take(step_out["bc_ok"]),
            corrected_bc=take(step_out["corrected_bc"]),
            bc_idx=take(step_out["bc_idx"]),
            novel_sj=take(step_out["novel_sj"]) if "novel_sj" in step_out
                else np.zeros(n, bool),
            sj_donor=take(step_out["sj_donor"]) if "sj_donor" in step_out
                else np.zeros(n, np.int64),
            sj_acceptor=take(step_out["sj_acceptor"])
                if "sj_acceptor" in step_out else np.zeros(n, np.int64),
            sj_right_len=take(step_out["sj_right_len"])
                if "sj_right_len" in step_out else np.zeros(n, np.int32),
        ))

    def write(self, path: str, dedup_out: dict, bc_len: int, umi_len: int,
              gem_group: int = 1):
        gi, txome = self.gi, self.txome
        if not self.chunks:
            BamWriter(path, gi.chrom_names,
                      list(np.diff(gi.chrom_starts).astype(int))).close()
            return

        cat = {k: (np.concatenate([c[k] for c in self.chunks])
                   if isinstance(self.chunks[0][k], np.ndarray)
                   else sum((c[k] for c in self.chunks), []))
               for k in self.chunks[0] if self.chunks[0][k] is not None}
        n = len(cat["pos"])
        mapped = cat["mapq"] > 0 if "mapped" not in cat else cat["mapped"]

        # corrected-UMI / low-support lookup from the dedup raw-triple view
        raw_bc = np.asarray(dedup_out["raw_bc"])
        raw_gene = np.asarray(dedup_out["raw_gene"])
        raw_umi = np.asarray(dedup_out["raw_umi"])
        raw_corr = np.asarray(dedup_out["raw_corr_umi"])
        raw_low = np.asarray(dedup_out["raw_low"])
        triple_map = {}
        for i in np.flatnonzero(np.asarray(dedup_out["raw_is_repr"])):
            triple_map[(int(raw_bc[i]), int(raw_gene[i]), int(raw_umi[i]))] = (
                int(raw_corr[i]), bool(raw_low[i]))

        g = gi.pos_to_genomic(cat["pos"].astype(np.int64),
                              cat["aln_len"].astype(np.int64))
        sort_key = np.where(mapped, g["chrom"].astype(np.int64), 2**31) * (1 << 33) \
            + np.where(mapped, g["gpos"] + g["donor_off"] * 0, 0)
        order = np.argsort(sort_key, kind="stable")

        ref_lens = list(np.diff(gi.chrom_starts).astype(int))
        w = BamWriter(path, gi.chrom_names, ref_lens)
        gene_ids = [g_.id for g_ in txome.genes]
        gene_names = [g_.name for g_ in txome.genes]
        seen_umi_count: set = set()

        for i in order:
            L = int(cat["rna_len"][i])
            st = int(cat["strand"][i])
            codes = cat["rna"][i][:L]
            nm = cat["nmask"][i][:L]
            seq = encode.decode_codes(codes, nm)
            qual = bytes(cat["rna_qual"][i][:L])
            if st == 1:
                seq = seq.translate(bytes.maketrans(b"ACGTN", b"TGCAN"))[::-1]
                qual = qual[::-1]

            raw_bc_s = encode.decode_codes(
                encode.unpack_np(cat["bc_packed"][i], bc_len))
            bq = bytes(cat["bc_qual"][i])
            umi_s = encode.decode_codes(
                encode.unpack_np(cat["umi_packed"][i], umi_len))
            uq = bytes(cat["umi_qual"][i][:umi_len])
            tags = [("CR", "Z", raw_bc_s), ("CY", "Z", bq),
                    ("UR", "Z", umi_s), ("UY", "Z", uq)]
            if cat["bc_ok"][i]:
                cb = encode.decode_codes(
                    encode.unpack_np(cat["corrected_bc"][i], bc_len))
                tags.append(("CB", "Z", cb + b"-%d" % gem_group))

            xf = 0
            flag = 0
            if not mapped[i]:
                w.write_record(cat["names"][i], FLAG_UNMAPPED, -1, -1, 0, [],
                               seq, qual, tags)
                continue
            if st == 1:
                flag |= FLAG_REVERSE
            chrom = int(g["chrom"][i])
            gpos = int(g["gpos"][i])
            alen = int(cat["aln_len"][i])
            astart = int(cat["aln_start"][i])
            cig = []
            if astart:
                cig.append((astart, BAM_CSOFT_CLIP))
            if g["spliced"][i] and g["intron_len"][i] > 0:
                d = int(g["donor_off"][i])
                cig += [(d, BAM_CMATCH), (int(g["intron_len"][i]), BAM_CREF_SKIP),
                        (alen - d, BAM_CMATCH)]
                rclip = L - astart - alen
            elif cat["novel_sj"][i]:
                # discovered junction: left M, intron N, right M
                intron = int(cat["sj_acceptor"][i]) - int(cat["sj_donor"][i])
                rlen = int(cat["sj_right_len"][i])
                cig += [(alen, BAM_CMATCH), (intron, BAM_CREF_SKIP),
                        (rlen, BAM_CMATCH)]
                rclip = L - astart - alen - rlen
            else:
                cig.append((alen, BAM_CMATCH))
                rclip = L - astart - alen
            if rclip > 0:
                cig.append((rclip, BAM_CSOFT_CLIP))

            gene = int(cat["gene"][i])
            region = REGION_CHARS[int(cat["region"][i])]
            tags.append(("RE", "A", region))
            if cat["conf_ok"][i]:
                tags.append(("GX", "Z", gene_ids[gene]))
                tags.append(("GN", "Z", gene_names[gene]))
                xf |= XF_CONF_MAPPED
                key = (int(cat["bc_idx"][i]), gene, int(cat["umi_packed"][i]))
                corr_umi, low = triple_map.get(
                    key, (int(cat["umi_packed"][i]), False))
                if cat["umi_valid"][i]:
                    ub = encode.decode_codes(encode.unpack_np(
                        np.uint32(corr_umi), umi_len))
                    tags.append(("UB", "Z", ub))
                if low:
                    xf |= XF_LOW_SUPPORT_UMI
                else:
                    mol_key = (key[0], gene, corr_umi)
                    if mol_key not in seen_umi_count:
                        # first conf read of the molecule in coordinate order
                        # is the UMI-count representative (the reference picks
                        # min (UmiType, qname); parity TODO)
                        seen_umi_count.add(mol_key)
                        xf |= XF_UMI_COUNT
                    else:
                        xf |= XF_DUP
            w.write_record(cat["names"][i], flag, chrom, gpos,
                           int(cat["mapq"][i]), cig, seq, qual,
                           tags + [("xf", "i", xf)])
        w.close()
