"""bench.py supervisor: jax-free child orchestration — warm-rerun and
retry-on-flap behavior (the tunneled runtime drops connections for hours;
an official record must survive)."""

import json
import os
import sys

import pytest


def _write_child(path, fail_times, status=None):
    """A stand-in bench child: exits 1 `fail_times` times (counted in a
    sidecar), then succeeds writing `status` and a JSON line."""
    count_file = str(path) + ".count"
    body = f"""
import json, os, sys
cf = {count_file!r}
n = int(open(cf).read()) if os.path.exists(cf) else 0
open(cf, 'w').write(str(n + 1))
if n < {fail_times}:
    sys.exit(1)
with open(os.environ['LECO_BENCH_STATUS'], 'w') as s:
    json.dump({status!r}, s)
print(json.dumps({{'metric': 'fake', 'value': 1.0}}))
"""
    with open(path, "w") as f:
        f.write(body)
    return count_file


@pytest.fixture
def supervisor(monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # no backoff wait
    return bench


class TestSupervisor:
    def test_retries_failed_children(self, supervisor, tmp_path, monkeypatch):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=2,
                          status={"cache_hit": True, "ttfi": 1.0})
        monkeypatch.setattr(supervisor, "__file__", str(child))
        monkeypatch.setenv("LECO_BENCH_RETRIES", "3")
        supervisor.supervise()
        assert int(open(cf).read()) == 3  # 2 failures + 1 success

    def test_gives_up_after_retry_budget(self, supervisor, tmp_path,
                                         monkeypatch):
        child = tmp_path / "child.py"
        _write_child(child, fail_times=99, status={})
        monkeypatch.setattr(supervisor, "__file__", str(child))
        monkeypatch.setenv("LECO_BENCH_RETRIES", "1")
        with pytest.raises(SystemExit):
            supervisor.supervise()

    def test_cold_run_triggers_warm_rerun(self, supervisor, tmp_path,
                                          monkeypatch):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=0,
                          status={"cache_hit": False, "ttfi": 100.0})
        monkeypatch.setattr(supervisor, "__file__", str(child))
        monkeypatch.setenv("LECO_BENCH_RETRIES", "0")
        supervisor.supervise()
        # first run cold -> exactly one rerun (two runs total)
        assert int(open(cf).read()) == 2

    def test_warm_run_stops_immediately(self, supervisor, tmp_path,
                                        monkeypatch):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=0,
                          status={"cache_hit": True, "ttfi": 1.0})
        monkeypatch.setattr(supervisor, "__file__", str(child))
        supervisor.supervise()
        assert int(open(cf).read()) == 1
