"""Annotation semantics: region, strand, gene assignment, conf-mapping."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.align.index import GenomeIndex
from cellranger_tpu.align.annotate import (
    AnnotationIndex, make_annotator, REGION_EXONIC, REGION_INTRONIC,
    REGION_INTERGENIC, GENE_NONE,
)
from cellranger_tpu.io.gtf import Transcriptome

from util import random_genome, make_two_gene_gtf


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(21)
    genome = random_genome(rng, 10_000)
    p = tmp_path_factory.mktemp("ann")
    make_two_gene_gtf(str(p / "genes.gtf"))
    txome = Transcriptome.from_gtf(str(p / "genes.gtf"))
    gi = GenomeIndex.build({"chr1": genome}, txome)
    ann = AnnotationIndex.build(txome, gi)
    annotate = make_annotator(ann, gi.genome_len, gi.sj_overhang, "+")
    return txome, gi, ann, annotate


def run(annotate, pos, alen, strand):
    n = len(pos)
    out = annotate(jnp.asarray(pos, jnp.int32), jnp.asarray(alen, jnp.int32),
                   jnp.asarray(strand, jnp.int32),
                   jnp.full(n, 255, jnp.int32), jnp.ones(n, bool))
    return {k: np.asarray(v) for k, v in out.items()}


def test_exonic_sense(setup):
    txome, gi, ann, annotate = setup
    # GeneA exon1 = [1000,1400) strand +; read fully inside, fwd strand
    out = run(annotate, [1100], [91], [0])
    assert out["region"][0] == REGION_EXONIC
    assert out["gene"][0] == 0  # GA is gene index 0
    assert out["conf_mapped"][0]
    assert not out["antisense"][0]


def test_exonic_antisense(setup):
    *_, annotate = setup
    # same exon, reverse-strand read on a '+' chemistry = antisense
    out = run(annotate, [1100], [91], [1])
    assert out["region"][0] == REGION_EXONIC
    assert out["gene"][0] == GENE_NONE
    assert out["antisense"][0]
    assert not out["conf_mapped"][0]


def test_intronic(setup):
    *_, annotate = setup
    # GeneA intron = [1400, 2200); read fully inside
    out = run(annotate, [1600], [91], [0])
    assert out["region"][0] == REGION_INTRONIC
    assert out["gene"][0] == 0  # include-introns mode counts it
    assert out["conf_mapped"][0]


def test_intergenic(setup):
    *_, annotate = setup
    out = run(annotate, [8000], [91], [0])
    assert out["region"][0] == REGION_INTERGENIC
    assert out["gene"][0] == GENE_NONE
    assert not out["conf_mapped"][0]


def test_minus_strand_gene(setup):
    *_, annotate = setup
    # GeneB exon [5000,5800) strand -; sense read must be reverse-strand
    out = run(annotate, [5100, 5100], [91, 91], [1, 0])
    assert out["gene"][0] == 1 and out["conf_mapped"][0]
    assert out["gene"][1] == GENE_NONE and out["antisense"][1]


def test_half_overlap_exon_boundary(setup):
    *_, annotate = setup
    # read straddling exon1 start: 60 of 91 bases inside exon -> exonic (>=50%)
    out = run(annotate, [1000 - 31], [91], [0])
    assert out["region"][0] == REGION_EXONIC
    # read with only 20 bases in exon: not exonic; partially in tx span ->
    # not fully contained => intergenic per containment rule
    out = run(annotate, [1000 - 71], [91], [0])
    assert out["region"][0] == REGION_INTERGENIC


def test_junction_contig_read(setup):
    txome, gi, ann, annotate = setup
    # position inside the junction contig, crossing the junction midpoint
    pos = gi.genome_len + gi.sj_overhang - 45
    out = run(annotate, [pos], [91], [0])
    assert out["region"][0] == REGION_EXONIC
    assert out["gene"][0] == 0
    assert out["conf_mapped"][0]


def test_low_mapq_not_conf(setup):
    *_, annotate = setup
    out_ = make_annotator  # silence lints
    txome, gi, ann, annotate = setup
    o = annotate(jnp.asarray([1100], jnp.int32), jnp.asarray([91], jnp.int32),
                 jnp.asarray([0], jnp.int32), jnp.asarray([3], jnp.int32),
                 jnp.asarray([True]))
    assert not bool(o["conf_mapped"][0])


def test_uint32_pos_dtype_equivalence(setup):
    # parity-mode aligners hand the annotator uint32 positions; results
    # must match the int32 path bit for bit
    *_, annotate = setup
    pos, alen, strand = [1100, 1500, 4000], [91, 91, 91], [0, 1, 0]
    n = len(pos)
    a = {k: np.asarray(v) for k, v in annotate(
        jnp.asarray(pos, jnp.int32), jnp.asarray(alen, jnp.int32),
        jnp.asarray(strand, jnp.int32), jnp.full(n, 255, jnp.int32),
        jnp.ones(n, bool)).items()}
    b = {k: np.asarray(v) for k, v in annotate(
        jnp.asarray(pos, jnp.uint32), jnp.asarray(alen, jnp.int32),
        jnp.asarray(strand, jnp.int32), jnp.full(n, 255, jnp.int32),
        jnp.ones(n, bool)).items()}
    for k in a:
        assert (a[k] == b[k]).all(), k
