"""Test shim: the BAM reader now lives in the package
(cellranger_tpu/io/bam_read.py) so the conformance comparators can use it."""

from cellranger_tpu.io.bam_read import CIGAR_OPS, SEQ_CHARS, read_bam  # noqa: F401
