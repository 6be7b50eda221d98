"""UMI correction + duplicate marking as sorted-segment device ops.

Re-expresses the reference's per-barcode hashmap algorithm
(lib/rust/tx_annotation/src/mark_dups.rs) as fixed-shape batched array ops:

  * correct_umis (mark_dups.rs:19-59): each distinct (bc, gene, umi) moves to
    the 1-Hamming neighbor UMI with strictly greater read count, or equal
    count and lexicographically larger UMI (packed-u32 order == lex order).
  * the Cell Ranger 3 two-phase count movement (mark_dups.rs:227-247): ONE
    read of each corrected UMI moves before low-support determination, the
    remainder after.
  * determine_low_support_umigenes (mark_dups.rs:87-108): within each
    (bc, umi), the top gene by read count survives; on a tie for the max all
    genes are marked low-support (putative chimeras).

Instead of per-barcode HashMaps on threads, everything is a lexicographic
sort (lax.sort, multi-key) + segmented reductions + batched binary-search
joins over the sorted tables. All shapes static; invalid rows carry sentinel
keys that sort to the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32_MAX = jnp.uint32(0xFFFFFFFF)


def _ceil_log2(n: int) -> int:
    b = 1
    while (1 << b) < n:
        b += 1
    return b


def lex3_search(k1, k2, k3, q1, q2, q3):
    """Leftmost index where sorted (k1,k2,k3) >= query tuple; all uint32.

    Returns (idx int32, found bool) — found iff exact tuple present.
    """
    N = k1.shape[0]
    iters = _ceil_log2(max(N, 2)) + 1
    lo = jnp.zeros(q1.shape, jnp.int32)
    hi = jnp.full(q1.shape, N, jnp.int32)
    for _ in range(iters):
        mid = (lo + hi) >> 1
        midc = jnp.clip(mid, 0, N - 1)
        a, b, c = k1[midc], k2[midc], k3[midc]
        lt = (a < q1) | ((a == q1) & ((b < q2) | ((b == q2) & (c < q3))))
        lt = lt & (mid < hi)  # guard degenerate
        lo = jnp.where(lt, mid + 1, lo)
        hi = jnp.where(lt, hi, mid)
    idx = jnp.clip(lo, 0, N - 1)
    found = (lo < N) & (k1[idx] == q1) & (k2[idx] == q2) & (k3[idx] == q3)
    return idx, found


def _seg_ids(new_seg):
    """bool [N] first-of-segment flags -> int32 segment ids."""
    return jnp.cumsum(new_seg.astype(jnp.int32)) - 1


@functools.partial(jax.jit, static_argnames=("umi_len",))
def dedup_molecules(bc, gene, umi, valid, umi_len: int):
    """Full UMI correction + low-support marking + molecule counting.

    Inputs (all [N]): bc uint32 (barcode index or packed seq), gene uint32,
    umi uint32 (2-bit packed), valid bool (conf-mapped rows only).

    Returns dict of [N] arrays describing the deduplicated molecule table:
      mol_bc/mol_gene/mol_umi: corrected molecule keys (sorted by
        (bc, gene, corrected umi); one representative row per molecule),
      mol_reads: reads per molecule,
      mol_valid: representative & not low-support,
      n_molecules: scalar count of valid molecules.
    """
    N = bc.shape[0]
    sent = U32_MAX

    bc = jnp.where(valid, bc, sent)
    gene = jnp.where(valid, gene, sent)
    umi = jnp.where(valid, umi, sent)

    # ---- phase 0: sort triples, count reads per distinct (bc, gene, umi) ----
    bc_s, gene_s, umi_s = jax.lax.sort((bc, gene, umi), num_keys=3)
    valid_s = bc_s != sent
    new_triple = jnp.concatenate(
        [jnp.ones(1, bool),
         (bc_s[1:] != bc_s[:-1]) | (gene_s[1:] != gene_s[:-1])
         | (umi_s[1:] != umi_s[:-1])])
    tid = _seg_ids(new_triple)
    reads_per_triple = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), tid, num_segments=N)
    cnt = reads_per_triple[tid]              # [N] count of own triple
    is_repr = new_triple & valid_s

    # ---- phase 1: UMI correction per distinct triple ----
    # mutants: umi ^ (d << shift), d in 1..3 — same trick as barcodes.
    # JOIN BY SORT, not by binary search: probing 3*umi_len mutants per
    # row with a log(N) binary search was ~20 gather rounds of [M, N]
    # random HBM reads (the 29s dedup wall of a 1M-read e2e run).  One
    # sort of originals+mutants, a cummax fill-forward join, and a
    # segment-max reduction are sequential-access passes instead; the
    # only remaining random reads are one [K] gather of matched counts
    # and the per-owner scatter-reduce.
    pos = jnp.arange(umi_len, dtype=jnp.uint32)
    shifts = (2 * (umi_len - 1 - pos)).astype(jnp.uint32)
    d = jnp.arange(1, 4, dtype=jnp.uint32)
    xor = (d[None, :] << shifts[:, None]).reshape(-1)        # [3*umi_len]
    mut = umi_s[None, :] ^ xor[:, None]                      # [M, N]
    M = mut.shape[0]
    K = (M + 1) * N
    c_bc = jnp.concatenate([bc_s, jnp.tile(bc_s, M)])
    c_gene = jnp.concatenate([gene_s, jnp.tile(gene_s, M)])
    c_umi = jnp.concatenate([umi_s, mut.reshape(-1)])
    # tag 0 = original (sorts before its mutants within an equal key)
    c_tag = jnp.concatenate([jnp.zeros(N, jnp.uint32),
                             jnp.ones(M * N, jnp.uint32)])
    c_cnt = jnp.concatenate([reads_per_triple[tid].astype(jnp.uint32),
                             jnp.zeros(M * N, jnp.uint32)])
    c_pay = jnp.concatenate([jnp.zeros(N, jnp.uint32),
                             jnp.arange(M * N, dtype=jnp.uint32)])
    sb, sg, su, st, sc, spay = jax.lax.sort(
        (c_bc, c_gene, c_umi, c_tag, c_cnt, c_pay), num_keys=4)
    ar = jnp.arange(K, dtype=jnp.int32)
    new_key = jnp.concatenate(
        [jnp.ones(1, bool),
         (sb[1:] != sb[:-1]) | (sg[1:] != sg[:-1]) | (su[1:] != su[:-1])])
    run_start = jax.lax.cummax(jnp.where(new_key, ar, 0))
    pos_fill = jax.lax.cummax(jnp.where(st == 0, ar, -1))
    # an original with the SAME key precedes iff the nearest preceding
    # original is inside this row's key run
    matched = (pos_fill >= run_start) & (st == 1)
    mcnt_s = jnp.where(matched,
                       sc[jnp.maximum(pos_fill, 0)].astype(jnp.int32), 0)
    # move rule over {original} + found mutants: lexicographic max of
    # (count, umi) — strictly greater count, or equal count and
    # lex-larger UMI (mark_dups.rs:42-49)
    owner = (spay % jnp.uint32(N)).astype(jnp.int32)
    pk_hi = jnp.where(st == 1, mcnt_s, -1)                    # count major
    pk_lo = jnp.where(st == 1, su, jnp.uint32(0))             # umi minor
    best_hi = jax.ops.segment_max(pk_hi, owner, num_segments=N)
    # umi tie-break among mutants at the max count: second reduction
    at_max = (st == 1) & (pk_hi == best_hi[owner]) & matched
    best_lo = jax.ops.segment_max(
        jnp.where(at_max, pk_lo, jnp.uint32(0)), owner, num_segments=N)
    ocnt = reads_per_triple[tid].astype(jnp.int32)
    take_mut = (best_hi > ocnt) | ((best_hi == ocnt) & (best_lo > umi_s))
    best_umi = jnp.where(take_mut, best_lo, umi_s)
    corr_umi = jnp.where(valid_s, best_umi, sent)             # per-row (via triple)
    is_corrected = corr_umi != umi_s

    # ---- phase 2+3: low-support determination on intermediate counts ----
    # Intermediate multiset after moving ONE read per corrected triple:
    # entry A = (bc, raw_umi, gene, c - corrected) ; entry B = (bc, corr_umi,
    # gene, corrected ? 1 : 0). Only representative rows contribute.
    corr_r = is_corrected & is_repr
    cntA = jnp.where(is_repr, cnt - corr_r.astype(jnp.int32), 0)
    cntB = jnp.where(corr_r, 1, 0)
    e_bc = jnp.concatenate([jnp.where(is_repr, bc_s, sent),
                            jnp.where(corr_r, bc_s, sent)])
    e_umi = jnp.concatenate([jnp.where(is_repr, umi_s, sent),
                             jnp.where(corr_r, corr_umi, sent)])
    e_gene = jnp.concatenate([jnp.where(is_repr, gene_s, sent),
                              jnp.where(corr_r, gene_s, sent)])
    e_cnt = jnp.concatenate([cntA, cntB])
    E = 2 * N
    eb, eu, eg, ec = jax.lax.sort((e_bc, e_umi, e_gene, e_cnt), num_keys=3)
    evalid = eb != sent
    e_new3 = jnp.concatenate(
        [jnp.ones(1, bool),
         (eb[1:] != eb[:-1]) | (eu[1:] != eu[:-1]) | (eg[1:] != eg[:-1])])
    e_t3 = _seg_ids(e_new3)
    merged = jax.ops.segment_sum(jnp.where(evalid, ec, 0), e_t3, num_segments=E)
    e_new2 = jnp.concatenate(
        [jnp.ones(1, bool), (eb[1:] != eb[:-1]) | (eu[1:] != eu[:-1])])
    e_t2 = _seg_ids(e_new2)
    mc = merged[e_t3]                         # merged count at each entry row
    is_e_repr = e_new3 & evalid
    seg_max = jax.ops.segment_max(
        jnp.where(is_e_repr, mc, -1), e_t2, num_segments=E)
    seg_n_at_max = jax.ops.segment_sum(
        (is_e_repr & (mc == seg_max[e_t2])).astype(jnp.int32),
        e_t2, num_segments=E)
    tie = seg_n_at_max[e_t2] >= 2
    low = evalid & (tie | (mc < seg_max[e_t2]))  # per entry row; same per triple

    # distinct-entry-triple table for the join: keys (bc, umi, gene) at
    # representative entries. The table is already sorted in that order.
    tb = jnp.where(is_e_repr, eb, sent)
    tu = jnp.where(is_e_repr, eu, sent)
    tg = jnp.where(is_e_repr, eg, sent)
    # compact ordering preserved (sentinels only where duplicates/invalid —
    # non-representative rows break sortedness; re-sort to be safe)
    tb, tu, tg, tlow = jax.lax.sort((tb, tu, tg, low.astype(jnp.int32)), num_keys=3)

    # ---- phase 4: per original triple, is corrected key low-support? ----
    # sort-join (same pattern as phase 1: sequential passes, no binary-
    # search gather rounds): table rows tag 0, query rows tag 1
    K2 = E + N
    jb = jnp.concatenate([tb, bc_s])
    ju = jnp.concatenate([tu, corr_umi])
    jg = jnp.concatenate([tg, gene_s])
    jtag = jnp.concatenate([jnp.zeros(E, jnp.uint32),
                            jnp.ones(N, jnp.uint32)])
    jlow = jnp.concatenate([tlow.astype(jnp.uint32),
                            jnp.zeros(N, jnp.uint32)])
    jpay = jnp.concatenate([jnp.zeros(E, jnp.uint32),
                            jnp.arange(N, dtype=jnp.uint32)])
    jb2, ju2, jg2, jt2, jl2, jp2 = jax.lax.sort(
        (jb, ju, jg, jtag, jlow, jpay), num_keys=4)
    ar2 = jnp.arange(K2, dtype=jnp.int32)
    new2 = jnp.concatenate(
        [jnp.ones(1, bool),
         (jb2[1:] != jb2[:-1]) | (ju2[1:] != ju2[:-1])
         | (jg2[1:] != jg2[:-1])])
    run_start2 = jax.lax.cummax(jnp.where(new2, ar2, 0))
    posf2 = jax.lax.cummax(jnp.where(jt2 == 0, ar2, -1))
    got = (posf2 >= run_start2) & (jt2 == 1)
    lowv = got & (jl2[jnp.maximum(posf2, 0)] > 0)
    low_support = jnp.zeros(N, bool).at[jp2.astype(jnp.int32)].max(
        jnp.where(jt2 == 1, lowv, False))
    low_support = jnp.where(valid_s, low_support, False)

    # ---- phase 5: final molecule table by (bc, gene, corrected umi) ----
    fb, fg, fu, fcnt, flow = jax.lax.sort(
        (bc_s, gene_s, corr_umi, jnp.where(is_repr, cnt, 0),
         low_support.astype(jnp.int32)),
        num_keys=3)
    fvalid = fb != sent
    f_new = jnp.concatenate(
        [jnp.ones(1, bool),
         (fb[1:] != fb[:-1]) | (fg[1:] != fg[:-1]) | (fu[1:] != fu[:-1])])
    fid = _seg_ids(f_new)
    mol_reads = jax.ops.segment_sum(jnp.where(fvalid, fcnt, 0), fid,
                                    num_segments=N)
    mol_low = jax.ops.segment_max(jnp.where(fvalid, flow, 0), fid,
                                  num_segments=N)
    f_repr = f_new & fvalid
    mol_valid = f_repr & (mol_low[fid] == 0)
    return dict(
        mol_bc=fb, mol_gene=fg, mol_umi=fu,
        mol_reads=mol_reads[fid], mol_valid=mol_valid,
        n_molecules=mol_valid.sum(),
        # raw-triple view (sorted by (bc, gene, raw umi)): the correction map
        # and low-support flags per distinct raw key, used downstream for BAM
        # UB tags, xf dup marking, and the highly-corrected-reads aggregate
        # signal (reads per raw triple at representative rows).
        raw_bc=bc_s, raw_gene=gene_s, raw_umi=umi_s,
        raw_corr_umi=corr_umi, raw_low=low_support, raw_is_repr=is_repr,
        raw_reads=jnp.where(is_repr, cnt, 0),
    )
