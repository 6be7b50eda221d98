"""Aligner correctness on synthetic genomes with known read origins."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.align.index import GenomeIndex
from cellranger_tpu.align.aligner import DeviceIndex, make_aligner
from cellranger_tpu.io.gtf import Transcriptome
from cellranger_tpu.ops import encode

from util import random_genome, mutate, revcomp, make_two_gene_gtf

READ_LEN = 91


def codes_batch(reads: list[bytes], L: int):
    B = len(reads)
    codes = np.zeros((B, L), np.uint8)
    mask = np.zeros((B, L), bool)
    for i, r in enumerate(reads):
        c, v = encode.encode_seqs(np.frombuffer(r[:L], dtype=np.uint8))
        codes[i, :len(c)] = c
        mask[i, :len(c)] = v
    return jnp.asarray(codes), jnp.asarray(mask)


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(3)
    genome = random_genome(rng, 60_000)
    gi = GenomeIndex.build({"chr1": genome}, None)
    return genome, gi, DeviceIndex.from_host(gi)


def test_unique_mapping(small_index):
    genome, gi, didx = small_index
    rng = np.random.default_rng(5)
    align = make_aligner(didx, READ_LEN)
    n = 256
    truth_pos, reads, strands = [], [], []
    for _ in range(n):
        p = int(rng.integers(0, len(genome) - READ_LEN))
        frag = genome[p:p + READ_LEN]
        frag = mutate(rng, frag, 3)
        st = int(rng.integers(2))
        reads.append(revcomp(frag) if st else frag)
        truth_pos.append(p)
        strands.append(st)
    codes, mask = codes_batch(reads, READ_LEN)
    out = align(codes, mask)
    pos = np.asarray(out["pos"]); mapped = np.asarray(out["mapped"])
    mapq = np.asarray(out["mapq"]); strand = np.asarray(out["strand"])
    ok = mapped & (pos == np.asarray(truth_pos)) & (strand == np.asarray(strands))
    frac = ok.mean()
    assert frac > 0.97, f"only {frac:.2%} mapped correctly"
    assert (mapq[ok] == 255).mean() > 0.95


def test_unmappable_reads(small_index):
    _, _, didx = small_index
    rng = np.random.default_rng(11)
    align = make_aligner(didx, READ_LEN)
    reads = [random_genome(rng, READ_LEN) for _ in range(64)]
    codes, mask = codes_batch(reads, READ_LEN)
    out = align(codes, mask)
    assert np.asarray(out["mapped"]).mean() < 0.05


def test_soft_clip_polya(small_index):
    genome, _, didx = small_index
    rng = np.random.default_rng(13)
    align = make_aligner(didx, READ_LEN)
    # read = 60 genome bases + 31 polyA: local alignment should clip the tail
    p = 7000
    read = genome[p:p + 60] + b"A" * (READ_LEN - 60)
    codes, mask = codes_batch([read], READ_LEN)
    out = align(codes, mask)
    assert bool(out["mapped"][0])
    assert int(out["pos"][0]) == p
    assert int(out["aln_start"][0]) == 0
    assert 55 <= int(out["aln_len"][0]) <= 68  # polyA tail clipped (few chance matches)


def test_spliced_read_maps_to_junction_contig(tmp_path):
    rng = np.random.default_rng(17)
    genome = random_genome(rng, 10_000)
    gtf = tmp_path / "genes.gtf"
    make_two_gene_gtf(str(gtf))
    txome = Transcriptome.from_gtf(str(gtf))
    gi = GenomeIndex.build({"chr1": genome}, txome)
    assert gi.n_junctions == 1
    didx = DeviceIndex.from_host(gi)
    align = make_aligner(didx, READ_LEN)

    # read spanning the junction: last 45 bases of exon1 + first 46 of exon2
    spliced = genome[1400 - 45:1400] + genome[2200:2200 + 46]
    # unspliced genomic read elsewhere
    plain = genome[3000:3000 + READ_LEN]
    codes, mask = codes_batch([spliced, plain], READ_LEN)
    out = align(codes, mask)
    pos = np.asarray(out["pos"]); mapped = np.asarray(out["mapped"])
    assert mapped.all()
    assert pos[0] >= gi.genome_len, "spliced read should hit the junction contig"
    assert int(out["mapq"][0]) == 255, "genome+contig dups must canonicalize"
    g = gi.pos_to_genomic(np.asarray([pos[0]]), np.asarray(out["aln_len"])[0:1])
    assert bool(g["spliced"][0])
    assert g["gpos"][0] == 1400 - 45
    assert g["intron_len"][0] == 800
    assert g["donor_off"][0] == 45
    assert pos[1] == 3000


def test_n_bases_masked(small_index):
    genome, _, didx = small_index
    align = make_aligner(didx, READ_LEN)
    p = 9000
    read = bytearray(genome[p:p + READ_LEN])
    for i in (10, 30, 50):
        read[i] = ord("N")
    codes, mask = codes_batch([bytes(read)], READ_LEN)
    assert not bool(mask[0, 10])
    out = align(codes, mask)
    assert bool(out["mapped"][0]) and int(out["pos"][0]) == p


def test_sw_rescue_indel_read(small_index):
    genome, _, didx = small_index
    align = make_aligner(didx, READ_LEN)
    # read with a 4-base deletion in the middle: ungapped best run < 50,
    # still above score_min, but check the SW fields report a higher score
    p = 20000
    read = genome[p:p + 45] + genome[p + 49:p + 49 + (READ_LEN - 45)]
    codes, mask = codes_batch([read], READ_LEN)
    out = align(codes, mask)
    assert bool(out["mapped"][0])
    assert int(out["sw_score"][0]) > int(out["score"][0])
    assert int(out["sw_score"][0]) >= READ_LEN - 12  # deletion costs ~8+slack
