"""Hypothesis property tests for the two order-sensitive core operators.

Randomized inputs (entity counts, irregular/duplicate-ish timestamps, value
gaps) against independent oracles: pandas.merge_asof for the as-of join and
a plain-Python window builder for sliding windows. Few examples, Spark job
per example — bounded runtime, deadline disabled."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_extractor_spark.operators.asof import asof_join
from feature_extractor_spark.operators.windows import sliding_windows

BASE = dt.datetime(2024, 1, 1)

# (entity, minute-offset, value) series: offsets get cumsum'd per entity so
# ts is strictly increasing per entity but irregular; entity sets of left
# and right sides intentionally overlap only partially.
series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=1, max_value=90),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)

_spark = None


@pytest.fixture(autouse=True)
def _cap(spark):
    global _spark
    _spark = spark
    yield


def _frame(rows, val_name):
    by_e: dict[int, int] = {}
    out = []
    for e, gap, v in rows:
        by_e[e] = by_e.get(e, 0) + gap
        out.append((f"e{e}", BASE + dt.timedelta(minutes=by_e[e]), float(v)))
    pdf = pd.DataFrame(out, columns=["doc_id", "ts", val_name])
    # strictly increasing per entity by construction (gap >= 1)
    return pdf


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=series, right=series)
def test_asof_join_matches_merge_asof(left, right):
    lp = _frame(left, "value")
    rp = _frame(right, "obs")
    ldf = _spark.createDataFrame(lp)
    rdf = _spark.createDataFrame(rp)
    got = (
        asof_join(ldf, rdf, on="ts", by="doc_id", strategy="union_locf")
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        lp.sort_values("ts", kind="mergesort"),
        rp.sort_values("ts", kind="mergesort"),
        on="ts",
        by="doc_id",
        direction="backward",
    ).sort_values(["doc_id", "ts"], kind="mergesort")
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        got["obs"].to_numpy(dtype=float),
        exp["obs"].to_numpy(dtype=float),
        rtol=1e-9,
        equal_nan=True,
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=series, w=st.integers(min_value=1, max_value=6))
def test_sliding_windows_match_python_oracle(rows, w):
    pdf = _frame(rows, "value")
    df = _spark.createDataFrame(pdf)
    got = (
        sliding_windows(df, "doc_id", "ts", ["value"], w)
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    exp_rows = []
    for e, grp in pdf.sort_values("ts", kind="mergesort").groupby("doc_id"):
        vals = grp["value"].tolist()
        for i in range(w - 1, len(vals)):
            exp_rows.append((e, grp["ts"].iloc[i], vals[i - w + 1 : i + 1]))
    exp_rows.sort(key=lambda r: (r[0], r[1]))
    assert len(got) == len(exp_rows)
    for (_, _, ew), gw in zip(exp_rows, got["window"]):
        np.testing.assert_allclose(list(gw), ew, rtol=1e-9)
