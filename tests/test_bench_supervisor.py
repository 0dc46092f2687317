"""Bench supervisor protocol (leco_tpu.utils.benchkit, shared by bench.py,
scripts/bench_xl.py and scripts/bench_full.py): jax-free child
orchestration — warm-rerun and retry-on-flap behavior (the tunneled runtime
drops connections for hours; an official record must survive), plus history
hygiene (git sha stamped, failed appends warned not swallowed)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from leco_tpu.utils import benchkit  # noqa: E402


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
def no_backoff(monkeypatch):
    monkeypatch.setattr(benchkit.time, "sleep", lambda s: None)


class TestSupervisor:
    def test_retries_failed_children(self, no_backoff, tmp_path, monkeypatch):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=2,
                          status={"cache_hit": True, "ttfi": 1.0})
        monkeypatch.setenv("LECO_BENCH_RETRIES", "3")
        benchkit.supervise(str(child))
        assert int(open(cf).read()) == 3  # 2 failures + 1 success

    def test_gives_up_after_retry_budget(self, no_backoff, tmp_path,
                                         monkeypatch):
        child = tmp_path / "child.py"
        _write_child(child, fail_times=99, status={})
        monkeypatch.setenv("LECO_BENCH_RETRIES", "1")
        with pytest.raises(SystemExit):
            benchkit.supervise(str(child))

    def test_cold_run_triggers_warm_rerun(self, no_backoff, tmp_path,
                                          monkeypatch):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=0,
                          status={"cache_hit": False, "ttfi": 100.0})
        monkeypatch.setenv("LECO_BENCH_RETRIES", "0")
        benchkit.supervise(str(child))
        # first run cold -> exactly one rerun (two runs total)
        assert int(open(cf).read()) == 2

    def test_warm_run_stops_immediately(self, no_backoff, tmp_path):
        child = tmp_path / "child.py"
        cf = _write_child(child, fail_times=0,
                          status={"cache_hit": True, "ttfi": 1.0})
        benchkit.supervise(str(child))
        assert int(open(cf).read()) == 1

class TestHistory:
    def test_append_stamps_ts_and_sha(self, tmp_path):
        hist = tmp_path / "hist.jsonl"
        benchkit.append_history({"metric": "m", "value": 1.0}, str(hist))
        entry = json.loads(hist.read_text().strip())
        assert entry["metric"] == "m" and "ts" in entry
        # repo is a git checkout, so the sha must be present
        assert entry.get("git_sha")

    def test_failed_append_warns_not_swallows(self, tmp_path, capsys):
        # a directory path cannot be opened for append -> OSError branch
        benchkit.append_history({"v": 1}, str(tmp_path))
        err = capsys.readouterr().err
        assert "WARNING" in err and "bench history" in err


class TestStallWatchdog:
    """A frozen child must exit rc=3 so supervise() can retry (observed:
    batch-2 full runs stalled mid-loop with the process alive — the
    supervisor only sees exits, so a hang blocked the protocol forever)."""

    def _run(self, body):
        import subprocess

        return subprocess.run(
            [sys.executable, "-c", body],
            capture_output=True, text=True, timeout=30,
            env={**os.environ, "PYTHONPATH": os.path.dirname(
                os.path.dirname(__file__))},
        )

    def test_stalled_progress_aborts_rc3(self):
        r = self._run(
            "import time\n"
            "from leco_tpu.utils import benchkit\n"
            "stamp = [time.perf_counter()]\n"
            "benchkit.stall_watchdog(lambda: stamp[0], timeout_s=0.3,\n"
            "                        first_timeout_s=60, label='t')\n"
            "time.sleep(20)\n"
        )
        assert r.returncode == 3
        assert "no progress" in r.stdout

    def test_no_first_event_aborts_rc3(self):
        r = self._run(
            "import time\n"
            "from leco_tpu.utils import benchkit\n"
            "benchkit.stall_watchdog(lambda: None, timeout_s=60,\n"
            "                        first_timeout_s=0.3, label='t')\n"
            "time.sleep(20)\n"
        )
        assert r.returncode == 3
        assert "no first progress" in r.stdout

    def test_advancing_progress_survives(self):
        r = self._run(
            "import time\n"
            "from leco_tpu.utils import benchkit\n"
            "stamp = [time.perf_counter()]\n"
            "benchkit.stall_watchdog(lambda: stamp[0], timeout_s=0.5,\n"
            "                        first_timeout_s=60, label='t')\n"
            "for _ in range(8):\n"
            "    time.sleep(0.2); stamp[0] = time.perf_counter()\n"
            "print('survived')\n"
        )
        assert r.returncode == 0
        assert "survived" in r.stdout
