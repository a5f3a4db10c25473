"""StageTimer / trace helpers (SURVEY.md §5 observability)."""

import json
import os
import tempfile
import time

from plslam_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert s["b"]["count"] == 1
    assert s["a"]["mean_ms"] >= 10.0


def test_stage_timer_jsonl_dump():
    t = StageTimer()
    with t.stage("x"):
        pass
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "stages.jsonl")
        t.dump_jsonl(p)
        t.dump_jsonl(p)
        lines = open(p).readlines()
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert "x" in rec
