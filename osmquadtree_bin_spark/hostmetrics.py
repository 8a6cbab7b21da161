"""Host-side metric counters for per-phase job accounting.

Two complementary views, both from /proc (Linux-only, None elsewhere):

* whole-guest busy/steal jiffies (`proc_stat`) — tells apart "this phase is
  slow" from "this phase was robbed" on a shared host (steal is the
  hypervisor's counter of runnable-but-preempted time);
* process-group CPU jiffies (`pg_cpu_jiffies`) — the job's OWN compute cost
  (driver python + the JVM it launched + executor JVMs + Arrow UDF workers,
  which all inherit the pgid), immune to BOTH hypervisor steal (steal
  inflates wall, never CPU time) and other guest processes.

A third, diagnostic view (`pg_cpu_by_role`) splits the process-group CPU by
WHO burned it — per-thread, classified by thread name and process cmdline:
executor task threads vs GC vs JIT vs shuffle/netty vs the Python driver vs
Arrow UDF workers. This is how a "4N cores burn 3× the CPU of N" finding
gets attributed: duplicated JVM services (GC/JIT per executor) look very
different from inflated task compute (memory stalls / recomputation).
"""

from __future__ import annotations

import glob
import os


def proc_stat() -> tuple[int, int, int] | None:
    """(busy, steal, total) jiffies from the aggregate /proc/stat line."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:9]]
        return v[0] + v[1] + v[2] + v[5] + v[6], v[7], sum(v)
    except (OSError, IndexError, ValueError):
        return None


def _job_pids() -> set[int] | None:
    """PIDs of the caller and every live DESCENDANT process, by walking the
    /proc ppid tree. Process-GROUP membership is NOT sufficient for "the
    job's own processes": pyspark's Python daemon calls ``os.setpgid(0, 0)``
    (pyspark/daemon.py), so every Arrow/pandas UDF worker leaves the group
    and its CPU vanished from the old pgrp-based accounting — which made
    UDF-heavy stages (pip) look like they ran under neighbor competition
    (busy ≫ "own") and systematically fail the busy-clean admission gate.
    The parent CHAIN stays intact (no setsid / double-fork in that path),
    so descendant-tree membership captures driver JVM → executor JVMs →
    daemons → workers completely, and nothing that is not ours."""
    try:
        me = os.getpid()
    except OSError:
        return None
    ppid: dict[int, int] = {}
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(st) as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            ppid[int(st.split("/")[2])] = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
    if not ppid:
        return None
    kids: dict[int, list[int]] = {}
    for p, pp in ppid.items():
        kids.setdefault(pp, []).append(p)
    out: set[int] = set()
    stack = [me]
    while stack:
        p = stack.pop()
        if p in out:
            continue
        out.add(p)
        stack.extend(kids.get(p, ()))
    return out


def pg_cpu_jiffies() -> int | None:
    """CPU jiffies (utime+stime, incl. reaped children via cutime/cstime) of
    the caller and every descendant process (see ``_job_pids`` for why the
    tree, not the process group, defines "the job's own processes"). A
    child's time is counted from its own /proc entry while alive and folds
    into the parent's cutime/cstime when reaped, so the sum is continuous
    across process exits."""
    pids = _job_pids()
    if not pids:
        return None
    total = 0
    seen = False
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                # comm can contain spaces/parens: split after the LAST ') '
                # — fields after it are fixed-position
                parts = f.read().rsplit(") ", 1)[1].split()
            seen = True
            total += sum(int(parts[i]) for i in (11, 12, 13, 14))
        except (OSError, IndexError, ValueError):
            continue
    # no /proc (non-Linux POSIX) — honor the documented None contract
    # instead of reporting 0 jiffies
    return total if seen else None


def pg_cpu_seconds_delta(before: int | None, after: int | None) -> float | None:
    if before is None or after is None:
        return None
    return round((after - before) / os.sysconf("SC_CLK_TCK"), 2)


# ------------------------------------------------------- role attribution
# Thread-name prefixes → role buckets. HotSpot names its service threads
# stably ("GC Thread#3", "G1 Conc#0", "C2 CompilerThre", "VM Thread");
# Spark's executor task threads are "Executor task l" (truncated to 15
# chars by the kernel comm limit).
_THREAD_ROLES = (
    ("Executor task", "task"),
    ("GC Thread", "gc"),
    ("G1 ", "gc"),
    ("VM Thread", "gc"),
    ("C2 Compiler", "jit"),
    ("C1 Compiler", "jit"),
    ("shuffle-", "net"),
    ("netty", "net"),
    ("rpc-", "net"),
    ("dispatcher-", "net"),
)


def _proc_role(pid: str) -> str:
    """Classify a process by cmdline: the driver JVM vs executor JVMs vs
    python (driver script / Arrow UDF workers) vs everything else."""
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return "gone"
    if "CoarseGrainedExecutorBackend" in cmd:
        return "exec-jvm"
    if "java" in cmd.split(" ", 1)[0]:
        return "driver-jvm"
    if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
        return "py-udf"
    if "python" in cmd.split(" ", 1)[0]:
        return "py-driver"
    return "other"


def pg_cpu_by_role() -> dict[str, int] | None:
    """Per-role CPU jiffies (utime+stime) for every THREAD of the caller's
    descendant-process tree (see ``_job_pids``). Role key is
    ``proc-role/thread-bucket`` for JVM service threads (task/gc/jit/net),
    else just the proc role. Diagnostic companion to ``pg_cpu_jiffies`` —
    no cutime folding, so short-lived reaped children are missed; use for
    attribution shares, not absolute totals."""
    pids = _job_pids()
    if not pids:
        return None
    out: dict[str, int] = {}
    for p in pids:
        pid = str(p)
        prole = _proc_role(pid)
        for tst in glob.glob(f"/proc/{pid}/task/[0-9]*/stat"):
            try:
                with open(tst) as f:
                    raw = f.read()
                comm = raw[raw.index("(") + 1 : raw.rindex(")")]
                tparts = raw.rsplit(") ", 1)[1].split()
                jif = int(tparts[11]) + int(tparts[12])
            except (OSError, IndexError, ValueError):
                continue
            if not jif:
                continue
            bucket = prole
            if prole.endswith("jvm"):
                for pref, b in _THREAD_ROLES:
                    if comm.startswith(pref):
                        bucket = f"{prole}/{b}"
                        break
                else:
                    bucket = f"{prole}/misc"
            out[bucket] = out.get(bucket, 0) + jif
    return out


def role_delta_seconds(
    before: dict[str, int] | None, after: dict[str, int] | None
) -> dict[str, float] | None:
    """Per-role CPU-seconds between two ``pg_cpu_by_role`` snapshots
    (roles only present before are dropped; a reaped thread's tail is
    lost — see pg_cpu_by_role)."""
    if before is None or after is None:
        return None
    tck = os.sysconf("SC_CLK_TCK")
    out = {}
    for k, v in after.items():
        d = v - before.get(k, 0)
        if d > 0:
            out[k] = round(d / tck, 2)
    return out
