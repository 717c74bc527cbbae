"""Mimics the driver's verify: run every queries() entry and its
oracle_sql() on the same parquet, compare row count + schema + values
(order-insensitive). Catches engine/oracle drift before the driver does.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class mirroring what the driver's value hash is
    sensitive to: an int column stringifies as '42' while a float one
    gives '42.0', and DuckDB's HUGEINT (uncast sum()) lands in pandas
    as float64 — so integer-vs-float divergence between engines breaks
    the driver hash even when every value matches (the r3 red rows)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # the driver's canonicalizer sorts columns through pandas and
            # dies on unhashable lists — reject them here so the repo
            # harness predicts the driver instead of under-approximating
            # it (r3 fds_convert err). Queries must flatten or to_json
            # array outputs.
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], (list, np.ndarray)):
                raise AssertionError(
                    f"top-level list/array column {c!r}: the driver "
                    f"canonicalizer cannot sort it — flatten to scalars "
                    f"or to_json it in the query AND the oracle")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("float64").round(6)
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entrymod.queries()[name]
    got_raw = q(spark, sf_dir).toPandas()
    want_raw = ddb.execute(entrymod.oracle_sql()[name]).df()
    # dtype-class agreement BEFORE canonicalization: the driver's value
    # hash distinguishes int from float (and bool from int), so the repo
    # harness must too — this is what let the r3 HUGEINT oracle rows sail
    # through 418 green tests and go red at the driver.
    for c in sorted(set(got_raw.columns) & set(want_raw.columns)):
        gc, wc = _dtype_class(got_raw[c]), _dtype_class(want_raw[c])
        assert gc == wc, (
            f"{name}.{c}: dtype class {gc} (spark {got_raw[c].dtype}) vs "
            f"{wc} (oracle {want_raw[c].dtype}) — the driver hash will "
            f"mismatch; cast both sides to the same class "
            f"(e.g. ::BIGINT on DuckDB sum())")
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            ok = np.isclose(g.fillna(-1e300), w.fillna(-1e300), rtol=1e-6, atol=1e-6)
        else:
            ok = g.astype(str).to_numpy() == w.astype(str).to_numpy()
        bad = np.nonzero(~np.asarray(ok))[0]
        assert len(bad) == 0, (
            f"{name}.{c}: {len(bad)} mismatches; first rows:\n"
            f"got  {got.iloc[bad[:3]].to_dict('records')}\n"
            f"want {want.iloc[bad[:3]].to_dict('records')}"
        )


NO_ORACLE = sorted(set(entrymod.queries().keys()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0 and "last_purchase_value" in df.columns
