"""Device feature-barcode extraction + matching (the FeatureExtractor
analog, cr_types/src/reference/feature_extraction.rs, as batched array ops).

Extraction runs entirely on device: anchored patterns slice at a static
offset; unanchored patterns locate their fixed prefix with a rolling packed
compare (first match wins, as the reference's regex leftmost match does).
Matching = one BucketTable row gather over the pattern's packed sequences,
with 1-Hamming posterior correction using the count column (the reference
corrects feature barcodes against the feature whitelist the same way cell
barcodes are corrected)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.feature_ref import CompiledPattern
from .bucket_table import BucketTable
from . import barcode as bcops


def make_feature_extractor(pattern: CompiledPattern, table: BucketTable,
                           feature_index: np.ndarray, read_len: int):
    """table: BucketTable (fields=3, counts filled). Returns jitted
    extract(rna, nmask, rna_len) -> dict(feature int32 [B] (-1 none),
    found bool, corrected bool)."""
    bc_len = pattern.bc_len
    pre = np.asarray(pattern.prefix_codes, np.int32)
    suf = np.asarray(pattern.suffix_codes, np.int32)
    fidx = jnp.asarray(feature_index)

    fixed_mask = pre != 255
    pre_fixed = np.where(fixed_mask, pre, 0).astype(np.uint8)

    def find_offset(rna, nmask, rna_len):
        """[B] barcode start offset (or -1)."""
        B, L = rna.shape
        if pattern.anchor3p:
            off = rna_len - len(suf) - bc_len
            return jnp.where(off >= len(pre), off, -1)
        if pattern.anchor5p or not fixed_mask.any():
            return jnp.full((B,), len(pre), jnp.int32)
        # rolling anchor search for the fixed prefix
        P = len(pre)
        n = L - P + 1
        ok = jnp.ones((B, n), bool)
        for i in range(P):
            if fixed_mask[i]:
                ok = ok & (rna[:, i:i + n] == pre_fixed[i]) & nmask[:, i:i + n]
        first = jnp.argmax(ok, axis=1).astype(jnp.int32)
        any_hit = jnp.any(ok, axis=1)
        return jnp.where(any_hit, first + P, -1)

    @jax.jit
    def extract(rna, nmask, rna_len):
        B, L = rna.shape
        off = find_offset(rna, nmask, rna_len)
        off_ok = (off >= 0) & (off + bc_len <= rna_len)
        offc = jnp.clip(off, 0, max(L - bc_len, 0))
        li = offc[:, None] + jnp.arange(bc_len)[None, :]
        bc_codes = jnp.take_along_axis(rna, li, axis=1)
        bc_ok = jnp.take_along_axis(nmask, li, axis=1).all(axis=1) & off_ok
        # verify fixed prefix bases for anchored patterns
        if (pattern.anchor5p or pattern.anchor3p) and fixed_mask.any():
            pli = (offc - len(pre))[:, None] + jnp.arange(len(pre))[None, :]
            pli = jnp.clip(pli, 0, L - 1)
            pc = jnp.take_along_axis(rna, pli, axis=1)
            for i in np.flatnonzero(fixed_mask):
                bc_ok = bc_ok & (pc[:, i] == pre_fixed[i])
        packed = jnp.zeros((B,), jnp.uint32)
        for i in range(bc_len):
            packed = (packed << 2) | bc_codes[:, i].astype(jnp.uint32)

        hit, idx = table.membership(packed)
        corr_bc, corr_idx, corrected = bcops.correct_barcodes(
            packed, jnp.full((B, bc_len), 70, jnp.uint8), table, bc_len)
        use_idx = jnp.where(hit, idx, jnp.where(corrected, corr_idx, -1))
        found = bc_ok & (use_idx >= 0)
        feature = jnp.where(found, fidx[jnp.maximum(use_idx, 0)], -1)
        return dict(feature=feature, found=found,
                    corrected=corrected & ~hit & bc_ok,
                    seq_idx=jnp.where(found, use_idx, -1),
                    # BAM fr/fq tags: where the feature barcode sits in the
                    # read (read.rs:1335-1352 FeatureExtracted tags)
                    offset=off, raw_packed=packed, extracted=bc_ok)

    return extract
