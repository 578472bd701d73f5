"""Local mirror of the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL over the same parquet tables,
sorts columns by name, canonicalizes values, and compares the full
multiset of rows — order-insensitive, like the driver's value-hash.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0; otherwise EXACT compare (the driver's value
        # hash is exact — rounding here would mask ulp mismatches locally)
        if v == 0:
            return 0.0
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    try:
        import datetime

        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
    except ImportError:
        pass
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(oracle, sf_dir)

    sc, s_multiset = _normalize(s_cols, s_rows)
    dc, d_multiset = _normalize(d_cols, d_rows)

    assert sc == dc, f"column mismatch: spark={sc} duckdb={dc}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_multiset != d_multiset:
        only_s = list((s_multiset - d_multiset).items())[:5]
        only_d = list((d_multiset - s_multiset).items())[:5]
        raise AssertionError(
            f"value mismatch (cols={sc}):\n only in spark: {only_s}\n only in duckdb: {only_d}"
        )
