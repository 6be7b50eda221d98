"""End-to-end drive: synthetic run directory -> run_count -> output checks.

Standalone driver (`python tests/e2e_drive.py`); the same flow runs in CI
as tests/test_conformance.py::test_e2e_golden_gate.  Builds the
deterministic tiny fixture (cellranger_tpu/testing/fixtures.py), runs the
public `pipeline.count.run_count`, verifies the filtered matrix, molecule
count, and cell calls against ground truth, then compiles the multi-chip
dryrun on 8 virtual CPU devices.
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def run(tmp: str | None = None, dryrun: bool = True) -> dict:
    from cellranger_tpu.testing.fixtures import build_synthetic_run, READ_LEN
    from cellranger_tpu.pipeline.count import CountConfig, run_count

    tmp = tmp or tempfile.mkdtemp(prefix="cr_tpu_e2e_")
    print("drive dir:", tmp)
    fx = build_synthetic_run(tmp)
    out_dir = os.path.join(tmp, "outs")
    cfg = CountConfig(
        fastq_pairs=[(fx["fq1"], fx["fq2"])], reference_path=fx["ref"],
        whitelist_path=fx["wl"], chemistry="SC3Pv3", read_len=READ_LEN,
        batch_size=4096, write_bam=True)
    summary = run_count(cfg, out_dir)

    # ---- ground-truth checks ----
    truth = fx["truth"]
    n_cells = truth.shape[1]
    n_mol_truth = int(truth.sum())
    assert summary["total_molecules"] == n_mol_truth, \
        (summary["total_molecules"], n_mol_truth)
    assert summary["estimated_cells"] == n_cells, summary["estimated_cells"]
    assert summary["correction_capacity_overflow"] == 0
    sat = summary["sequencing_saturation"]
    assert abs(sat - 0.5) < 1e-6, sat  # exactly 2 reads per molecule

    import h5py
    with h5py.File(os.path.join(out_dir, "filtered_feature_bc_matrix.h5")) as h:
        data = h["matrix/data"][:]
        assert data.sum() == n_mol_truth, (data.sum(), n_mol_truth)
        n_bc = h["matrix/barcodes"].shape[0]
        assert n_bc == n_cells
    assert os.path.exists(os.path.join(out_dir, "possorted_genome_bam.bam"))
    assert os.path.exists(os.path.join(out_dir, "molecule_info.h5"))
    assert os.path.exists(os.path.join(out_dir, "web_summary.html"))
    print("run_count checks passed:", json.dumps(
        {k: summary[k] for k in ("total_reads", "total_molecules",
                                 "estimated_cells", "sequencing_saturation",
                                 "conf_mapped_frac")}))

    if dryrun:
        # ---- multi-chip dryrun on 8 virtual CPU devices ----
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
        print("dryrun_multichip(8) passed")
        print("E2E DRIVE OK")
    return dict(out_dir=out_dir, summary=summary, fixture=fx)


if __name__ == "__main__":
    run()


def run_rich(tmp: str | None = None) -> dict:
    """Drive the RICH engineered fixture (fixtures.build_rich_run) through
    run_count with BAM + dual libraries; golden-gated in
    tests/test_conformance.py::test_e2e_rich_golden_gate."""
    from cellranger_tpu.testing.fixtures import build_rich_run, READ_LEN
    from cellranger_tpu.pipeline.count import (CountConfig, LibraryDef,
                                               run_count)

    tmp = tmp or tempfile.mkdtemp(prefix="cr_tpu_rich_")
    fx = build_rich_run(tmp)
    out_dir = os.path.join(tmp, "outs")
    cfg = CountConfig(
        fastq_pairs=[], reference_path=fx["ref"], whitelist_path=fx["wl"],
        feature_ref_csv=fx["feature_ref"],
        libraries=[LibraryDef([(fx["fq1"], fx["fq2"])], "Gene Expression"),
                   LibraryDef([(fx["ab_fq1"], fx["ab_fq2"])],
                              "Antibody Capture")],
        chemistry="SC3Pv3", read_len=READ_LEN,
        batch_size=4096, write_bam=True, checkpoint=False,
        secondary_analysis=False)
    summary = run_count(cfg, out_dir)
    print("rich run:", json.dumps(
        {k: summary[k] for k in ("total_reads", "total_molecules",
                                 "estimated_cells")}))
    return dict(out_dir=out_dir, summary=summary, fixture=fx)
