"""Chemistry registry parity against the reference's chemistry_defs.json.

Enumerates every non-spatial chemistry in the reference registry
(lib/rust/cr_types/src/chemistry/chemistry_defs.json) and asserts our
geometry (barcode/umi/rna/rna2 spans, whitelists, strandedness, endedness,
probe-barcode and overhang segments) matches field by field.  Skips when
the reference checkout is not present (the registry itself is still
covered by the structural tests below).
"""

import json
import os

import pytest

from cellranger_tpu.io.chemistry import CHEMISTRY_DEFS, get_chemistry

REF_JSON = "/root/reference/lib/rust/cr_types/src/chemistry/chemistry_defs.json"

SPATIAL = ("SPATIAL3Pv1", "SPATIAL3Pv2", "SPATIAL3Pv3", "SPATIAL3Pv4",
           "SPATIAL3Pv5", "SPATIAL-HD-v1")


def _span_tuple(span):
    if span is None:
        return None
    return (span.read, span.offset, span.length,
            span.min_length if span.min_length is not None else span.length)


def _ref_span_tuple(r):
    if r is None:
        return None
    ln = r["length"]
    mn = r.get("min_length")
    return (r["read_type"], r["offset"], ln, mn if mn is not None else ln)


@pytest.mark.skipif(not os.path.exists(REF_JSON),
                    reason="reference checkout not available")
def test_registry_matches_reference_defs():
    with open(REF_JSON) as f:
        ref = json.load(f)
    missing, mismatches = [], []
    for name, c in ref.items():
        if name in SPATIAL:
            continue
        if name not in CHEMISTRY_DEFS:
            missing.append(name)
            continue
        ours = CHEMISTRY_DEFS[name]
        segs = {s.get("kind", "gel_bead"): s for s in c["barcode"]}
        gb = segs["gel_bead"]

        def check(key, got, want):
            if got != want:
                mismatches.append(f"{name}.{key}: ours={got} ref={want}")

        check("bc", ( ours.barcode[0].span.read, ours.barcode[0].span.offset,
                      ours.barcode[0].span.length),
              (gb["read_type"], gb["offset"], gb["length"]))
        check("bc_wl", ours.barcode[0].whitelist, gb["whitelist"]["name"])
        check("umi", _span_tuple(ours.umi), _ref_span_tuple(c["umi"][0]))
        check("rna", _span_tuple(ours.rna), _ref_span_tuple(c["rna"]))
        check("rna2", _span_tuple(ours.rna2), _ref_span_tuple(c.get("rna2")))
        check("strand", ours.strandedness, c["strandedness"])
        check("end", ours.endedness, c["endedness"])
        oh = segs.get("overhang")
        check("overhang",
              (ours.overhang.read, ours.overhang.offset,
               ours.overhang.length) if ours.overhang else None,
              (oh["read_type"], oh["offset"], oh["length"]) if oh else None)
        pb = segs.get("right_probe")
        check("probe_bc",
              (ours.probe_bc.read, ours.probe_bc.offset,
               ours.probe_bc.length) if ours.probe_bc else None,
              (pb["read_type"], pb["offset"], pb["length"]) if pb else None)
        if pb is not None:
            check("probe_bc_wl", ours.probe_bc_whitelist,
                  pb["whitelist"]["name"])
    assert not missing, f"chemistries missing from registry: {missing}"
    assert not mismatches, "geometry mismatches:\n" + "\n".join(mismatches)


def test_registry_count_covers_non_spatial():
    # 42 reference chemistries - 6 spatial = 36 expected non-spatial defs
    names = {c.name for c in CHEMISTRY_DEFS.values()}
    assert len(names) >= 36, sorted(names)


def test_every_chemistry_is_well_formed():
    for name, c in CHEMISTRY_DEFS.items():
        assert c.barcode[0].span.length > 0
        assert c.umi.length > 0
        assert c.rna.read in ("R1", "R2")
        assert c.strandedness in ("+", "-")
        assert c.endedness in ("three_prime", "five_prime")
        assert get_chemistry(name) is c
