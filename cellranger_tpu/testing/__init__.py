from .correctness import (check_bam, check_h5, check_metrics, check_mtx,
                          check_molecule_info)

__all__ = ["check_metrics", "check_mtx", "check_h5", "check_bam",
           "check_molecule_info"]
