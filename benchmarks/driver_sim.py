"""Simulate the driver's bench run and assert its contract.

Round 4 shipped a preflight that ran ``bench.py`` in the builder's warm,
long-lived environment and passed — while the driver's fresh-process run
timed out and recorded nothing.  This gate reproduces the driver's
conditions exactly:

- a FRESH subprocess (no inherited jax state), from a clean cwd;
- a hard wall-clock budget (default 1200 s — conservative vs whatever the
  driver allows);
- the headline JSON line must appear within ``--headline-budget`` seconds
  (default 900) — the un-losable-bench guarantee;
- rc must be 0, the final line must parse, and the auxiliary stages must
  have added ZERO compilation-cache entries (the round-4 failure mode was
  an unbounded compile tail inside the post-processing smoke).

Exit 0 = the driver will record a number this round.
"""

from __future__ import annotations

import argparse
import json
import os
import selectors
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    # the total budget covers the worst LEGAL bench: headline up to the
    # headline budget, plus both auxiliary stage budgets (bench.py
    # P50_TIMEOUT_S + SMOKE_TIMEOUT_S = 900 s), plus slack — otherwise
    # the gate could kill a bench whose un-losable headline already
    # landed.  A healthy warm run finishes in ~7 min (measured 426 s).
    ap.add_argument("--budget", type=float, default=1900.0,
                    help="total wall-clock budget (s)")
    ap.add_argument("--headline-budget", type=float, default=900.0,
                    help="the first JSON line must appear within this (s)")
    ap.add_argument("--bench", default=None,
                    help="bench script to drive (default: repo bench.py; "
                         "overridable so the gate itself is testable)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.abspath(args.bench) if args.bench else os.path.join(
        repo, "bench.py")

    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, bench], cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    fd = proc.stdout.fileno()
    os.set_blocking(fd, False)
    sel = selectors.DefaultSelector()
    sel.register(fd, selectors.EVENT_READ)

    def _stop_bench() -> None:
        # graceful first: SIGKILLing a bench attached to the TPU tunnel
        # mid-compile wedges the tunnel for ~10-20 min and poisons the
        # NEXT preflight run (the run-twice rule makes that the common
        # next action).  SIGINT lets it unwind and close the connection
        # cleanly; escalate only if it ignores the interrupt.
        import signal as _signal
        try:
            proc.send_signal(_signal.SIGINT)
            proc.wait(timeout=30)
        except (subprocess.TimeoutExpired, OSError):
            proc.kill()

    lines: list[dict] = []
    t_headline = None
    buf = b""
    failed = None
    eof = False
    while not eof:
        elapsed = time.perf_counter() - t0
        if elapsed > args.budget:
            failed = f"total budget {args.budget:.0f}s exceeded"
            _stop_bench()
            break
        if lines == [] and elapsed > args.headline_budget:
            failed = (f"no headline within {args.headline_budget:.0f}s "
                      f"(un-losable-bench contract violated)")
            _stop_bench()
            break
        if not sel.select(timeout=5.0):
            if proc.poll() is not None:
                break
            continue
        while True:
            try:
                chunk = os.read(fd, 65536)
            except BlockingIOError:
                break
            if chunk == b"":
                eof = True
                break
            buf += chunk
        while b"\n" in buf:
            raw, buf = buf.split(b"\n", 1)
            line = raw.decode(errors="replace").strip()
            if line.startswith("{"):
                try:
                    lines.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
                if t_headline is None:
                    t_headline = time.perf_counter() - t0
                    print(f"[driver-sim] headline after {t_headline:.0f}s: "
                          f"{lines[0].get('value')} "
                          f"{lines[0].get('unit')}", flush=True)
    rc = proc.wait()
    wall = time.perf_counter() - t0

    if failed is None and rc != 0:
        failed = f"bench rc={rc}"
    if failed is None and not lines:
        failed = "no JSON line produced"
    if failed is None:
        final = lines[-1]
        extra = final.get("extra", {})
        if final.get("value", 0) <= 0:
            failed = f"non-positive headline value: {final.get('value')}"
        # The PREFLIGHT gate is STRICT where bench.py is lenient: bench
        # exits 0 on degraded extras so the driver never loses the
        # headline, but shipping a build whose auxiliary stages time
        # out, error, or skip their compile-tail accounting would hide
        # exactly the regressions the stages exist to catch (r3: smoke
        # OOM; r4: compile tail).  Degraded-at-the-driver is a salvage
        # path, not a healthy state to release from.
        elif extra.get("partial"):
            failed = ("only the partial headline landed — auxiliary "
                      "stages never completed")
        elif extra.get("degraded"):
            failed = f"degraded extras: {json.dumps(extra)}"
        for k, v in extra.items():
            if k.endswith("_cache_entries_delta") and v != 0:
                failed = (f"compile-tail: {k}={v} new XLA programs during "
                          f"an auxiliary stage (must be 0 on a warm cache)")
        for stage in ("p50", "smoke"):
            if failed is None and f"{stage}_cache_entries_delta" not in extra:
                failed = (f"stage '{stage}' reported no compile-tail "
                          f"accounting (timed out, errored, or was "
                          f"skipped) — extras: {json.dumps(extra)}")

    if failed:
        print(f"[driver-sim] FAIL after {wall:.0f}s: {failed}", flush=True)
        return 1
    print(f"[driver-sim] PASS in {wall:.0f}s "
          f"(headline at {t_headline:.0f}s, rc=0): "
          f"{json.dumps(lines[-1])}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
