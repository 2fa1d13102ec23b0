#!/usr/bin/env python
"""Outage watchdog for long TPU-tunnel runs (VERDICT r4 #1).

Two tunnel outages ate round 4's training windows; the failure mode is a
silent wedge — the child process (and even a fresh `jax.devices()`) hangs
forever while the run's log files stop advancing.  This wrapper:

  1. launches the wrapped command in its own process group,
  2. watches the newest mtime under --workdir (jsonl logs, checkpoints),
  3. if nothing has advanced for --stall-sec, SIGKILLs the process group
     (by pgid, never by pattern) and relaunches the command,
  4. relies on the command itself being idempotent (sustained_run.py
     --auto-resume resumes each phase from its `last` checkpoint), so a
     wedge costs minutes, not the round.

    python tools/watchdog_run.py --workdir runs/sustained_r5 -- \
        python tools/sustained_run.py --workdir runs/sustained_r5 ...
"""

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path


def newest_mtime(workdir: Path) -> float:
    latest = workdir.stat().st_mtime if workdir.exists() else 0.0
    for p in workdir.rglob("*"):
        try:
            m = p.stat().st_mtime
        except OSError:
            continue
        if m > latest:
            latest = m
    return latest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stall-sec", type=int, default=1200,
                    help="no file under workdir advanced for this long => "
                    "assume the tunnel wedged (first compile on a cold "
                    "cache can take several minutes; 20 min is safely "
                    "beyond any healthy gap between checkpoint writes)")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--poll-sec", type=int, default=30)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given (use -- python tools/sustained_run.py ...)"

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    run_tag = time.strftime("%m%d_%H%M%S")
    for attempt in range(args.max_restarts + 1):
        logf = workdir / f"watchdog_{run_tag}_attempt{attempt}.log"
        print(f"[watchdog] attempt {attempt}: {' '.join(cmd)} -> {logf}",
              flush=True)
        with open(logf, "wb") as out:
            proc = subprocess.Popen(
                cmd, stdout=out, stderr=subprocess.STDOUT,
                start_new_session=True,  # own pgid: kill the whole tree
            )
        start = time.time()
        killed = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(args.poll_sec)
            idle = time.time() - max(newest_mtime(workdir), start)
            if idle > args.stall_sec:
                print(f"[watchdog] STALL: no progress for {idle:.0f}s — "
                      f"killing pgid {proc.pid}", flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                killed = True
                break
        if not killed and rc == 0:
            print(f"[watchdog] command succeeded on attempt {attempt}",
                  flush=True)
            return 0
        if not killed:
            print(f"[watchdog] command exited rc={rc}; log tail:",
                  flush=True)
            sys.stdout.write(
                "\n".join(logf.read_text(errors="replace").splitlines()[-20:])
                + "\n")
        time.sleep(10)
    print("[watchdog] giving up after max restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
