"""Spark-free checks of __spark_entry__ harness helpers."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod


def test_rt_dir_honors_pq_rt_dir(tmp_path, monkeypatch):
    """Round-trip sinks must land under PQ_RT_DIR when set (the shared-
    filesystem root a real cluster needs) and in the system tmp dir
    otherwise."""
    root = tmp_path / "shared"
    monkeypatch.setenv("PQ_RT_DIR", str(root))
    d = entrymod._rt_dir("pq_rt_test_")
    assert os.path.isdir(d)
    assert os.path.dirname(d) == str(root)
    monkeypatch.delenv("PQ_RT_DIR")
    d2 = entrymod._rt_dir("pq_rt_test_")
    assert os.path.isdir(d2) and not d2.startswith(str(root))


def test_driver_window_composition():
    """The audit window contract: the driver consumes the FIRST 50
    queries() entries, which must equal DRIVER_ORDER's head — unique
    names, all resolvable, every one oracled.  DRIVER_ORDER may carry
    rows past index 50 (next-window queue, e.g. r10's
    x_iceberg_overwrite staged first for the r11 window); those must
    follow immediately in dict order and be oracled too."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n = len(entrymod.DRIVER_ORDER)
    assert n >= 50
    assert len(set(entrymod.DRIVER_ORDER)) == n
    names = list(qs)
    assert names[:n] == entrymod.DRIVER_ORDER
    missing = [x for x in entrymod.DRIVER_ORDER if x not in oracles]
    assert not missing, f"window rows without oracle: {missing}"
