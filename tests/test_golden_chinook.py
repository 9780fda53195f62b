"""Reference README goldens, verbatim (/root/reference/README.md).

These are the only end-to-end fixtures the reference itself publishes; they
pin byte-level parity on its own data (chinook CSVs) including IEEE-double
aggregation artifacts like 49.620000000000005 (README.md:40).
"""

from __future__ import annotations

import os

import pytest

CHINOOK = "/root/reference/examples/chinook/csv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CHINOOK), reason="reference chinook data not present"
)


@pytest.fixture(scope="module")
def engine(spark):
    from prql_query_spark.engine import PrqlEngine

    eng = PrqlEngine(spark)
    eng.add_sources([
        f"invoices={CHINOOK}/invoices.csv",
        f"customers={CHINOOK}/customers.csv",
        f"albums={CHINOOK}/albums.csv",
    ])
    return eng


def test_golden_top10_spend(engine):
    # README.md:34-49
    rows = engine.query(
        'from invoices | join customers [customer_id] '
        '| derive [name = f"{first_name} {last_name}"] '
        '| group name (aggregate [spend = sum total]) '
        '| sort [-spend] | take 10'
    ).collect()
    got = [(r.name, r.spend) for r in rows]
    assert got[0] == ("Helena Holý", 49.620000000000005)
    assert got[1] == ("Richard Cunningham", 47.620000000000005)
    assert got[2] == ("Luis Rojas", 46.62)
    assert len(got) == 10
    assert got[-1][1] == 42.62


def test_golden_take5_albums(engine):
    # README.md:23-32
    rows = engine.query("from albums | sort album_id | take 5").collect()
    assert [r.album_id for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].title == "For Those About To Rock We Salute You"


def test_golden_customer_totals_shape(engine):
    # README.md:177-197 (customer_totals.prql): group/agg/sort/take spine
    rows = engine.query(
        "from invoices | group customer_id "
        "(aggregate [total = sum total]) | sort [-total, customer_id] | take 10"
    ).collect()
    assert len(rows) == 10
    totals = [r.total for r in rows]
    assert totals == sorted(totals, reverse=True)
    assert totals[0] == 49.620000000000005
