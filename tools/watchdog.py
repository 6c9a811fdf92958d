#!/usr/bin/env python
"""Wall-clock stall watchdog for the measurement harnesses.

Round-9's sorter-spill read-ahead deadlock presented as a stage parked
at N-1/N tasks with an idle box — invisible until someone jstack'ed
the JVM by hand, hours into the run.  This guard generalizes that
diagnosis: wrap any measured block in :class:`StallWatchdog` and, if
the block overruns its budget, the watchdog

* dumps every Spark JVM's thread stacks (``jstack``, falling back to
  ``SIGQUIT`` which makes the JVM print the dump to its own stderr),
* dumps the Python stacks of the driving process (``faulthandler``),
* prints ONE loud stderr line naming the label, the elapsed wall, and
  the dump paths,

then re-arms (dumps repeat every budget interval) WITHOUT killing the
run — the dumps are the diagnosis; whether to abort stays a human
call.  Used by tools/scale_decades.py and tools/skew_probe.py; budget
via ``SPARK_GRAFT_STALL_TIMEOUT`` seconds (default 1800).
"""

from __future__ import annotations

import faulthandler
import os
import signal
import subprocess
import sys
import threading
import time

DEFAULT_TIMEOUT = float(os.environ.get("SPARK_GRAFT_STALL_TIMEOUT", "1800"))


def _spark_jvm_pids() -> list[int]:
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True,
            timeout=30,
        ).stdout
    except Exception:
        return []
    pids = []
    for line in out.splitlines():
        low = line.lower()
        if "java" in low and ("spark" in low or "sparksubmit" in low):
            try:
                pids.append(int(line.split(None, 1)[0]))
            except (ValueError, IndexError):
                continue
    return pids


def _jstack(pid: int, path: str) -> bool:
    jstack = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "jstack")
    if os.path.exists(jstack):
        try:
            with open(path, "w") as f:
                subprocess.run([jstack, str(pid)], stdout=f, timeout=60)
            return True
        except Exception:
            pass
    # fallback: the JVM prints a full thread dump to ITS stderr on
    # SIGQUIT (lands in the run log the harness already captures)
    try:
        os.kill(pid, signal.SIGQUIT)
        return True
    except OSError:
        return False


class StallWatchdog:
    """``with StallWatchdog("q_basket_brand_pairs"):`` — dump stacks
    when the block exceeds its wall budget, repeating each interval."""

    def __init__(
        self,
        label: str,
        timeout_s: float = DEFAULT_TIMEOUT,
        dump_dir: str = "/tmp",
        dump_jvm: bool = True,
    ):
        self.label = label
        self.timeout_s = timeout_s
        self.dump_dir = dump_dir
        self.dump_jvm = dump_jvm
        self._done = threading.Event()
        self._t0 = 0.0
        self.fired = 0

    def _dump(self) -> None:
        self.fired += 1
        elapsed = time.monotonic() - self._t0
        stamp = f"{self.label}_{self.fired}"
        paths = []
        pypath = os.path.join(self.dump_dir, f"stall_{stamp}_py.txt")
        try:
            with open(pypath, "w") as f:
                f.write(f"STALL {self.label}: {elapsed:.0f}s elapsed\n")
                faulthandler.dump_traceback(file=f, all_threads=True)
            paths.append(pypath)
        except Exception:
            pass
        if self.dump_jvm:
            for pid in _spark_jvm_pids():
                jp = os.path.join(
                    self.dump_dir, f"stall_{stamp}_jvm{pid}.txt"
                )
                if _jstack(pid, jp):
                    paths.append(
                        jp if os.path.exists(jp) else f"SIGQUIT->{pid}"
                    )
        print(
            f"### STALL WATCHDOG: {self.label!r} still running after "
            f"{elapsed:.0f}s (budget {self.timeout_s:.0f}s) — stack dumps: "
            f"{', '.join(paths) or 'none available'}",
            file=sys.stderr,
            flush=True,
        )

    def _run(self) -> None:
        while not self._done.wait(self.timeout_s):
            self._dump()

    def __enter__(self) -> "StallWatchdog":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._done.set()
        self._thread.join(timeout=5)
