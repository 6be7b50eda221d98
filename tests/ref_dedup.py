"""Plain-python spec implementation of the reference UMI dedup algorithm
(lib/rust/tx_annotation/src/mark_dups.rs) used as the oracle for the device
kernel. Dict/loop based, deliberately independent of the jnp implementation."""

from collections import defaultdict


def correct_umis(counts: dict, umi_len: int) -> dict:
    """counts: {(bc, gene, umi_int): n}. Returns {(bc,gene,umi): corrected_umi}.
    Move to 1-HD neighbor with greater count, ties -> lexicographically
    (numerically, MSB-first packing) larger UMI. (mark_dups.rs:19-59)"""
    corrections = {}
    for (bc, gene, umi), orig in counts.items():
        best_cnt, best_umi = orig, umi
        for pos in range(umi_len):
            shift = 2 * (umi_len - 1 - pos)
            for d in (1, 2, 3):
                test = umi ^ (d << shift)
                c = counts.get((bc, gene, test), 0)
                if c == 0 and (bc, gene, test) not in counts:
                    continue
                if c > best_cnt or (c == best_cnt and test > best_umi):
                    best_cnt, best_umi = c, test
        if best_umi != umi:
            corrections[(bc, gene, umi)] = best_umi
    return corrections


def dedup_spec(rows, umi_len: int):
    """rows: iterable of (bc, gene, umi) per read (conf-mapped only).

    Returns (molecules: {(bc, gene, corrected_umi): reads},
             low_support: set of (bc, gene, corrected_umi))
    following BarcodeDupMarker::new (mark_dups.rs:200-276).
    """
    counts = defaultdict(int)
    for r in rows:
        counts[tuple(r)] += 1
    counts = dict(counts)

    corrections = correct_umis(counts, umi_len)

    # phase 1: move one read per corrected key, then determine low support
    inter = dict(counts)
    for (bc, gene, umi), cu in corrections.items():
        inter[(bc, gene, umi)] -= 1
        inter[(bc, gene, cu)] = inter.get((bc, gene, cu), 0) + 1

    by_bc_umi = defaultdict(list)
    for (bc, gene, umi), c in inter.items():
        by_bc_umi[(bc, umi)].append((gene, c))
    low_support = set()
    for (bc, umi), gcs in by_bc_umi.items():
        mx = max(c for _, c in gcs)
        tied = sum(1 for _, c in gcs if c == mx) >= 2
        for gene, c in gcs:
            if tied or c < mx:
                low_support.add((bc, gene, umi))

    # final molecule table: all reads move to corrected keys
    molecules = defaultdict(int)
    for (bc, gene, umi), c in counts.items():
        cu = corrections.get((bc, gene, umi), umi)
        molecules[(bc, gene, cu)] += c
    return dict(molecules), low_support
