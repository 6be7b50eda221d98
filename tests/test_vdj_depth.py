"""VDJ assembly depth: graph cleaning suite, per-base contig quals,
primer trimming."""

import numpy as np

from cellranger_tpu.vdj.assembly import (BarcodeGraph, K, MIN_CONTIG_LEN,
                                         all_inner_primers,
                                         assemble_barcode,
                                         contig_base_quals,
                                         trim_primer_read, _revcomp_b)


def _kmers(seq: str) -> list[int]:
    out = []
    for i in range(len(seq) - K + 1):
        km = 0
        for ch in seq[i:i + K]:
            km = (km << 2) | "ACGT".index(ch)
        out.append(km)
    return out


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _support(seq: str, umi: int, reads: int, sup=None):
    sup = sup if sup is not None else {}
    for km in _kmers(seq):
        sup.setdefault(km, {})
        sup[km][umi] = sup[km].get(umi, 0) + reads
    return sup


def test_branch_clean_removes_weak_umi_bubble():
    """A SNP bubble supported by 1 read of the same UMI that gives the
    main path 20 reads: branch_clean's 10x rule deletes the weak branch
    and assembly recovers the single true contig."""
    rng = np.random.default_rng(7)
    true = _rand_seq(rng, 120)
    # error path: single base flip mid-sequence
    p = 60
    alt = true[:p] + ("A" if true[p] != "A" else "C") + true[p + 1:]
    sup = _support(true, umi=1, reads=20)
    _support(alt[p - K + 1:p + K], umi=1, reads=1, sup=sup)  # bubble kmers
    g = BarcodeGraph(sup)
    n_before = len(g.support)
    g.clean()
    assert len(g.support) < n_before, "bubble kmers removed"
    contigs = assemble_barcode(g.spectrum())
    assert len(contigs) == 1
    assert contigs[0].seq == true or contigs[0].seq == _rc(true)


def _rc(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def test_comp_clean_drops_chimeric_component():
    """A UMI whose reads are 30:2 split across two disconnected
    components loses its support in the weak one; with no other UMI
    there, the junk component vanishes entirely."""
    rng = np.random.default_rng(8)
    real = _rand_seq(rng, 100)
    junk = _rand_seq(rng, 60)
    sup = _support(real, umi=5, reads=30)
    _support(junk, umi=5, reads=2, sup=sup)
    g = BarcodeGraph(sup)
    contigs_before = assemble_barcode(
        {km: sum(us.values()) for km, us in g.support.items()})
    assert len(contigs_before) == 2, "junk contig present before cleaning"
    g.clean()
    contigs = assemble_barcode(g.spectrum())
    assert len(contigs) == 1
    assert contigs[0].seq == real


def test_power_clean_requires_both_ratios():
    """power_clean needs 10x UMIs AND 10x reads: a branch with many
    UMIs but comparable reads survives."""
    rng = np.random.default_rng(9)
    stem = _rand_seq(rng, 40)
    a = stem + _rand_seq(rng, 40)
    b = stem + _rand_seq(rng, 40)
    sup = {}
    for u in range(10):
        _support(a, umi=u, reads=3, sup=sup)
    _support(b, umi=99, reads=25, sup=sup)  # few UMIs but real read depth
    g = BarcodeGraph(sup)
    g.power_clean()
    # b's branch kmers survive (read ratio not 10x)
    assert any(99 in us for us in g.support.values())


def test_contig_base_quals_profile():
    rng = np.random.default_rng(10)
    contig = _rand_seq(rng, 80)
    reads = []
    for u in range(4):
        for _ in range(5):
            reads.append((u, contig[:60], b"I" * 60))  # cover first 60bp
    q = contig_base_quals(contig, reads)
    assert q[:40].min() >= 40, "deep agreeing coverage -> high qual"
    assert (q[60:] == 0).all(), "uncovered tail -> qual 0"
    # conflicting base across UMIs lowers the qual at that position
    bad = contig[:30] + ("A" if contig[30] != "A" else "C") + contig[31:60]
    reads2 = reads + [(u + 10, bad, b"I" * 60) for u in range(4)]
    q2 = contig_base_quals(contig, reads2)
    assert q2[30] < q[30]


def test_trim_primer_read():
    primers_rc = [_revcomp_b(p) for p in all_inner_primers()]
    rng = np.random.default_rng(11)
    body = _rand_seq(rng, 60)
    prim_rc = primers_rc[0].decode()
    read = _rand_seq(rng, 25) + prim_rc + body
    t = trim_primer_read(read, primers_rc)
    assert t == 25
    assert trim_primer_read(body, primers_rc) == 0


def test_exact_subclonotypes():
    """Cells with a 1-mismatch CDR3 variant fuzzy-merge into one clonotype
    but split into distinct exact subclonotypes (enclone semantics)."""
    from cellranger_tpu.vdj.annotate import group_clonotypes

    class _Seg:
        def __init__(self, name):
            self.gene_name = name

    class _Hit:
        def __init__(self, name):
            self.segment = _Seg(name)

    class _Ann:
        def __init__(self, chain, v, j, cdr3_nt):
            self.chain = chain
            self.v = _Hit(v)
            self.j = _Hit(j)
            self.cdr3_nt = cdr3_nt
            self.productive = True

    nt = "TGTGCCAGCAGCTTGGGACTTTT"         # 23nt
    nt_mut = nt[:-2] + "AT"                # 1-2 mismatches, same length
    cells = {
        "bc1-1": [_Ann("TRB", "TRBV1", "TRBJ1", nt)],
        "bc2-1": [_Ann("TRB", "TRBV1", "TRBJ1", nt)],
        "bc3-1": [_Ann("TRB", "TRBV1", "TRBJ1", nt_mut)],
    }
    cts = group_clonotypes(cells)
    assert len(cts) == 1
    c = cts[0]
    assert c["frequency"] == 3
    subs = c["exact_subclonotypes"]
    assert len(subs) == 2
    assert subs[0]["frequency"] == 2 and subs[1]["frequency"] == 1
    assert subs[0]["exact_subclonotype_id"] == 1
    assert {b for s in subs for b in s["barcodes"]} == set(cells)
