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
    """The audit window contract: 50 unique names, all resolvable to
    queries() entries, every one oracled, and the window leads the dict
    order the driver consumes."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(entrymod.DRIVER_ORDER) == 50
    assert len(set(entrymod.DRIVER_ORDER)) == 50
    names = list(qs)
    assert names[:50] == entrymod.DRIVER_ORDER
    missing = [n for n in entrymod.DRIVER_ORDER if n not in oracles]
    assert not missing, f"window rows without oracle: {missing}"
