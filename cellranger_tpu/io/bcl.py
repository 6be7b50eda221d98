"""Illumina BCL flowcell reading — the input side of mkfastq.

The reference shells out to bcl2fastq and post-routes with a Go demuxer
(mro/tenkit/make_fastqs.mro:37-98, lib/go/cmd/godemux/main.go:170); here the
conversion is native: per-cycle BCL decoding is a vectorized numpy
transpose (cycle-major -> cluster-major), so a tile converts in one pass.

Formats (classic HiSeq/MiSeq layout, also written by our test generator):
  RunInfo.xml                          read structure (NumCycles, IsIndexedRead)
  Data/Intensities/BaseCalls/L00<lane>/C<cycle>.1/s_<lane>_<tile>.bcl[.gz]
      u32 LE cluster count, then 1 byte/cluster:
      0 => N (qual 2-ish -> '#'), else base = b & 3 (ACGT), qual = b >> 2
  Data/Intensities/BaseCalls/L00<lane>/s_<lane>_<tile>.filter
      u32 0, u32 version, u32 count, then u8 pass-filter flags
  Data/Intensities/L00<lane>/s_<lane>_<tile>.locs
      u32 1, f32 1.0, u32 count, then (f32 x, f32 y) per cluster
"""

from __future__ import annotations

import glob
import gzip
import os
import re
import struct
import xml.etree.ElementTree as ET
from dataclasses import dataclass

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


@dataclass(frozen=True)
class ReadSegment:
    number: int
    num_cycles: int
    is_index: bool


@dataclass
class RunInfo:
    run_id: str
    flowcell: str
    lanes: int
    reads: list[ReadSegment]

    @property
    def total_cycles(self) -> int:
        return sum(r.num_cycles for r in self.reads)

    def segments(self):
        """[(segment, first_cycle_1based)] in cycle order."""
        out, c = [], 1
        for r in self.reads:
            out.append((r, c))
            c += r.num_cycles
        return out


def parse_run_info(run_dir: str) -> RunInfo:
    root = ET.parse(os.path.join(run_dir, "RunInfo.xml")).getroot()
    run = root.find("Run")
    reads = [ReadSegment(int(r.get("Number")), int(r.get("NumCycles")),
                         r.get("IsIndexedRead", "N").upper() == "Y")
             for r in run.find("Reads").findall("Read")]
    reads.sort(key=lambda r: r.number)
    fc = run.findtext("Flowcell", default="FC")
    lanes = int(run.find("FlowcellLayout").get("LaneCount", "1")) \
        if run.find("FlowcellLayout") is not None else 1
    return RunInfo(run.get("Id", "run"), fc, lanes, reads)


def _read_bcl(path: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (codes uint8 [N] 0..3, quals uint8 [N] phred; N-calls get base
    code 4)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        raw = f.read()
    n = struct.unpack_from("<I", raw, 0)[0]
    b = np.frombuffer(raw, np.uint8, count=n, offset=4)
    codes = np.where(b == 0, np.uint8(4), (b & 3).astype(np.uint8))
    quals = np.where(b == 0, np.uint8(2), (b >> 2).astype(np.uint8))
    return codes, quals


def _read_filter(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        raw = f.read()
    n = struct.unpack_from("<I", raw, 8)[0]
    return np.frombuffer(raw, np.uint8, count=n, offset=12).astype(bool)


def _read_locs(path: str) -> np.ndarray:
    """-> int32 [N, 2] Illumina name coordinates (x, y)."""
    with open(path, "rb") as f:
        raw = f.read()
    n = struct.unpack_from("<I", raw, 8)[0]
    xy = np.frombuffer(raw, "<f4", count=2 * n, offset=12).reshape(n, 2)
    return np.round(xy * 10.0 + 1000.0).astype(np.int32)


def tiles_of_lane(run_dir: str, lane: int) -> list[int]:
    base = os.path.join(run_dir, "Data", "Intensities", "BaseCalls",
                        f"L{lane:03d}")
    c1 = os.path.join(base, "C1.1")
    tiles = set()
    for p in glob.glob(os.path.join(c1, f"s_{lane}_*.bcl*")):
        m = re.match(rf"s_{lane}_(\d+)\.bcl", os.path.basename(p))
        if m:
            tiles.add(int(m.group(1)))
    return sorted(tiles)


def read_tile(run_dir: str, info: RunInfo, lane: int, tile: int):
    """Decode one tile -> dict per read segment: (seq uint8 ASCII [N, C],
    qual uint8 ASCII [N, C]) for PASSING-FILTER clusters, plus names.

    Cycle-major BCL bytes become cluster-major planes with one stack +
    transpose — the whole tile is a few numpy ops.
    """
    base = os.path.join(run_dir, "Data", "Intensities", "BaseCalls",
                        f"L{lane:03d}")
    fpath = os.path.join(base, f"s_{lane}_{tile}.filter")
    keep = _read_filter(fpath) if os.path.exists(fpath) else None
    lpath = os.path.join(run_dir, "Data", "Intensities", f"L{lane:03d}",
                         f"s_{lane}_{tile}.locs")

    out = {}
    n_clusters = None
    for seg, c0 in info.segments():
        codes_c, quals_c = [], []
        for c in range(c0, c0 + seg.num_cycles):
            cdir = os.path.join(base, f"C{c}.1")
            p = os.path.join(cdir, f"s_{lane}_{tile}.bcl")
            if not os.path.exists(p):
                p += ".gz"
            cd, qd = _read_bcl(p)
            codes_c.append(cd)
            quals_c.append(qd)
        codes = np.stack(codes_c, axis=1)      # [N, C]
        quals = np.stack(quals_c, axis=1)
        n_clusters = len(codes)
        if keep is not None:
            codes, quals = codes[keep], quals[keep]
        seq = np.where(codes == 4, np.uint8(ord("N")),
                       BASES[np.minimum(codes, 3)])
        out[seg.number] = (seq, quals + 33)
    if keep is None:
        keep = np.ones(n_clusters, bool)
    if os.path.exists(lpath):
        locs = _read_locs(lpath)[keep]
    else:
        idx = np.arange(int(keep.sum()), dtype=np.int32)
        locs = np.stack([idx + 1000, np.full_like(idx, 1000)], axis=1)
    names = [b"%s:%d:%s:%d:%d:%d:%d" % (
        info.run_id.encode().split(b"_")[0], 1, info.flowcell.encode(),
        lane, tile, int(x), int(y)) for x, y in locs]
    return out, names
