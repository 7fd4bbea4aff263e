"""Stage timing utility."""

import json

from tpulc.utils.timing import StageTimer


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report(total_bytes=10_000_000)
    assert rep["a"]["calls"] == 2
    assert "MBps" in rep["a"]
    json.loads(t.json())
