"""Regenerate the golden snapshot of the e2e fixture outputs.

Run after an INTENTIONAL output change, review the diff, and commit:
    python tools/make_golden.py
The golden gate (tests/test_conformance.py) compares every future run
against these files with the conformance comparators
(cellranger_tpu/testing/correctness.py).
"""

import os
import shutil
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = os.path.join(REPO, "tests", "golden", "e2e")

FILES = [
    "metrics_summary.json",
    "filtered_feature_bc_matrix.h5",
    "molecule_info.h5",
    "possorted_genome_bam.bam",
    "raw_feature_bc_matrix/matrix.mtx.gz",
    "raw_feature_bc_matrix/barcodes.tsv.gz",
    "raw_feature_bc_matrix/features.tsv.gz",
    "filtered_barcodes.csv",
    "junctions.tsv",
]


def main():
    from e2e_drive import run
    res = run(tempfile.mkdtemp(prefix="cr_tpu_golden_"), dryrun=False)
    out = res["out_dir"]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for rel in FILES:
        src = os.path.join(out, rel)
        dst = os.path.join(GOLDEN_DIR, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        print("golden <-", rel)
    print("golden snapshot written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
