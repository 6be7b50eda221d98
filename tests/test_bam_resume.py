"""BAM-run resume (VERDICT r3 item 7): the sealed band spool is the
journal.  A --bam run killed after the FASTQ passes + dedup resumes
straight to band merge — the passes are NOT re-executed and the output
BAM is identical to an uninterrupted run (pipestance resume,
lib/rust/cr_wrap/src/mrp_args.rs:57-65)."""

import os

import numpy as np
import pytest

from cellranger_tpu.io.bam_read import read_bam
from cellranger_tpu.pipeline.count import CountConfig, run_count
from cellranger_tpu.testing.fixtures import build_synthetic_run


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("bamresume"))
    return build_synthetic_run(tmp, seed=21, genome_len=120_000,
                               n_wl=2000, n_cells=30, mols_per_cell=20,
                               dup_reads=2)


def _cfg(fx):
    return CountConfig(
        fastq_pairs=[(fx["fq1"], fx["fq2"])], reference_path=fx["ref"],
        whitelist_path=fx["wl"], chemistry="SC3Pv3", read_len=91,
        batch_size=1024, secondary_analysis=False, checkpoint=True,
        write_bam=True)


def _records(out):
    _, recs, _ = read_bam(os.path.join(out, "possorted_genome_bam.bam"))
    return [(r["name"], r["flag"], r["ref_id"], r["pos"], r["mapq"],
             tuple(r["cigar"]), r["seq"], tuple(sorted(r["tags"].items())))
            for r in recs]


def test_bam_run_resumes_from_sealed_spool(small_run, tmp_path, monkeypatch):
    fx = small_run
    # uninterrupted reference run
    out_ref = str(tmp_path / "ref_run")
    run_count(_cfg(fx), out_ref)
    ref_records = _records(out_ref)
    assert len(ref_records) > 0

    # attempt 1: die right at BAM write time (checkpoint + sealed spool
    # already on disk)
    from cellranger_tpu.pipeline import bam_out
    real_write = bam_out.BamCollector.write

    def boom(self, *a, **k):
        raise RuntimeError("killed mid-run")

    out2 = str(tmp_path / "resumed_run")
    monkeypatch.setattr(bam_out.BamCollector, "write", boom)
    with pytest.raises(RuntimeError, match="killed"):
        run_count(_cfg(fx), out2)
    monkeypatch.setattr(bam_out.BamCollector, "write", real_write)
    assert os.path.isdir(os.path.join(out2, "_bam_spool"))

    # attempt 2: must not re-execute the FASTQ passes
    from cellranger_tpu.pipeline import count as count_mod

    def no_pass(*a, **k):
        raise AssertionError("FASTQ pass re-executed on resume")

    monkeypatch.setattr(count_mod, "batches_from_fastqs", no_pass)
    summary = run_count(_cfg(fx), out2)
    assert summary["total_reads"] == fx["n_reads"]
    assert _records(out2) == ref_records
    # spool consumed + removed by the final write
    assert not os.path.isdir(os.path.join(out2, "_bam_spool"))


def test_bam_resume_invalidated_by_input_change(small_run, tmp_path,
                                                monkeypatch):
    """A changed FASTQ invalidates the fingerprint: the rerun re-executes
    the passes instead of resuming stale state."""
    fx = small_run
    out = str(tmp_path / "inval")
    from cellranger_tpu.pipeline import bam_out
    real_write = bam_out.BamCollector.write
    monkeypatch.setattr(bam_out.BamCollector, "write",
                        lambda self, *a, **k: (_ for _ in ()).throw(
                            RuntimeError("killed")))
    with pytest.raises(RuntimeError):
        run_count(_cfg(fx), out)
    monkeypatch.setattr(bam_out.BamCollector, "write", real_write)
    # touch an input: a changed mtime invalidates the fingerprint
    st = os.stat(fx["fq1"])
    os.utime(fx["fq1"], (st.st_atime, st.st_mtime + 10))
    summary = run_count(_cfg(fx), out)   # must NOT raise, must re-run
    assert summary["total_reads"] == fx["n_reads"]
    assert os.path.exists(os.path.join(out, "possorted_genome_bam.bam"))
