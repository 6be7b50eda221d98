"""PerfTrace (the _perf/LogPerf analog) unit behavior."""

import json
import time

from cellranger_tpu.perf import PerfTrace


def test_perf_trace_phases(tmp_path):
    p = PerfTrace()
    with p.phase("a"):
        time.sleep(0.02)
    with p.phase("b"):
        x = list(range(100_000))  # noqa: F841 — grow RSS a little
    d = p.to_dict()
    assert [ph["name"] for ph in d["phases"]] == ["a", "b"]
    assert d["phases"][0]["wall_s"] >= 0.02
    assert d["phases"][1]["start_s"] >= d["phases"][0]["wall_s"]
    assert d["total_wall_s"] >= d["phases"][0]["wall_s"]
    assert d["rss_mb"] > 0
    out = tmp_path / "_perf.json"
    p.write(str(out))
    assert json.load(open(out))["phases"][0]["name"] == "a"


def test_perf_trace_records_on_exception(tmp_path):
    p = PerfTrace()
    try:
        with p.phase("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert p.phases and p.phases[0]["name"] == "boom"
