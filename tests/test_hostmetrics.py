"""hostmetrics: the steal-immune per-phase CPU accounting used by the
north-rule scaling evidence (jobs/prepare_job.timed, tools/bench_scaling).

Linux-only counters — the module contracts to return None elsewhere, so
every test skips off-Linux rather than asserting platform behavior.
"""

import os
import sys

import pytest

from osmquadtree_bin_spark.hostmetrics import (
    pg_cpu_by_role,
    pg_cpu_jiffies,
    pg_cpu_seconds_delta,
    proc_stat,
    role_delta_seconds,
)

linux_only = pytest.mark.skipif(sys.platform != "linux", reason="/proc only")


def _burn(n: int = 4_000_000) -> int:
    return sum(i * i for i in range(n))


@linux_only
def test_pg_cpu_counts_own_busy_loop():
    p0 = pg_cpu_jiffies()
    _burn()
    p1 = pg_cpu_jiffies()
    d = pg_cpu_seconds_delta(p0, p1)
    # a ~0.5 s busy loop must register; the exact value is scheduler noise
    assert d is not None and d > 0.05


@linux_only
def test_proc_stat_monotone_totals():
    a = proc_stat()
    _burn(1_000_000)
    b = proc_stat()
    assert a and b
    assert b[2] > a[2]  # total jiffies advance
    assert b[0] >= a[0] and b[1] >= a[1]  # busy/steal never decrease


@linux_only
def test_role_attribution_sees_python_driver():
    r0 = pg_cpu_by_role()
    _burn()
    r1 = pg_cpu_by_role()
    d = role_delta_seconds(r0, r1)
    assert d is not None
    # the busy loop ran in THIS python process → py-driver bucket
    assert d.get("py-driver", 0) > 0.05
    # JVM buckets must not appear from nowhere — but in suite order an
    # earlier Spark test's JVM shares this process group, and its GC/timer
    # threads can legitimately tick a jiffy during the burn. Assert the
    # invariant only when the snapshot itself shows no JVM present.
    jvm_in_pg = any(k.startswith(("driver-jvm", "exec-jvm")) for k in (r1 or {}))
    if not jvm_in_pg:
        assert not any(k.startswith(("driver-jvm", "exec-jvm")) for k in d)


def test_role_delta_drops_vanished_and_zero_roles():
    before = {"py-driver": 100, "exec-jvm/task": 50, "gone-role": 10}
    after = {"py-driver": 200, "exec-jvm/task": 50}
    d = role_delta_seconds(before, after)
    tck = os.sysconf("SC_CLK_TCK") if sys.platform == "linux" else 100
    assert d == {"py-driver": round(100 / tck, 2)}
    assert role_delta_seconds(None, after) is None
    assert role_delta_seconds(before, None) is None
