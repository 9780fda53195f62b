"""The shared barrier helper (round-12): localCheckpoint locally,
reliable checkpoint() when a checkpoint dir is configured.

The dispatch is tested with duck-typed stubs so the shared pytest
session's checkpoint-dir state is never mutated (setCheckpointDir has no
unset, and flipping it would silently turn every later barrier call in
the session into a disk checkpoint).
"""

from __future__ import annotations

from prql_query_spark.engine.session import barrier


class _Stub:
    def __init__(self, ckdir):
        self.calls = []
        sc = self

        class _Ctx:
            @staticmethod
            def getCheckpointDir():
                return ckdir

        class _Sess:
            sparkContext = _Ctx()

        self.sparkSession = _Sess()

    def checkpoint(self, eager=True):
        self.calls.append(("checkpoint", eager))
        return self

    def localCheckpoint(self, eager=True):
        self.calls.append(("localCheckpoint", eager))
        return self


def test_barrier_local_when_no_checkpoint_dir():
    df = _Stub(ckdir=None)
    assert barrier(df) is df
    assert df.calls == [("localCheckpoint", True)]
    df2 = _Stub(ckdir=None)
    barrier(df2, eager=False)
    assert df2.calls == [("localCheckpoint", False)]


def test_barrier_reliable_when_checkpoint_dir_set():
    df = _Stub(ckdir="/tmp/ck")
    assert barrier(df) is df
    assert df.calls == [("checkpoint", True)]
    df2 = _Stub(ckdir="/tmp/ck")
    barrier(df2, eager=False)
    assert df2.calls == [("checkpoint", False)]


def test_barrier_local_fallback_when_context_unavailable():
    # Spark Connect sessions raise on sparkContext access; barrier must
    # fall back to the local path rather than fail the query.
    class _Raising(_Stub):
        @property
        def sparkSession(self):
            raise AttributeError("no sparkContext under Connect")

        @sparkSession.setter
        def sparkSession(self, v):
            pass

    df = _Raising(ckdir=None)
    barrier(df)
    assert df.calls == [("localCheckpoint", True)]


def test_barrier_roundtrip_values(spark):
    rows = [(i, i % 3) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "k"])
    out = barrier(df.groupBy("k").count(), eager=False)
    got = {(r["k"], r["count"]) for r in out.collect()}
    assert got == {(0, 7), (1, 7), (2, 6)}
