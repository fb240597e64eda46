"""Oracle-comparison harness mirroring the driver's correctness gate:
row-count + column names + order-insensitive exact value comparison
between a Spark DataFrame and a DuckDB result on the same parquet tables.
"""

from __future__ import annotations

import datetime as dt
import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def _key(row):
    return tuple((x is None, "" if x is None else str(x)) for x in row)


def compare(spark_df, duck_rel) -> dict:
    """Returns {'match': bool, 'detail': str} with first-difference info."""
    s_cols = sorted(spark_df.columns)
    d_df = duck_rel.df()
    d_cols = sorted(d_df.columns)
    if s_cols != d_cols:
        return {"match": False, "detail": f"schema mismatch: spark={s_cols} duck={d_cols}"}

    s_rows = [tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()]
    d_rows = [
        tuple(_norm(v) for v in row)
        for row in d_df[d_cols].itertuples(index=False, name=None)
    ]
    if len(s_rows) != len(d_rows):
        return {
            "match": False,
            "detail": f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}",
        }
    s_rows.sort(key=_key)
    d_rows.sort(key=_key)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return {
                "match": False,
                "detail": f"value mismatch at sorted row {i}: spark={a!r} duck={b!r}",
            }
    return {"match": True, "detail": f"{len(s_rows)} rows, {len(s_cols)} cols"}
