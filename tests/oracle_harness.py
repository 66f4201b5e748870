"""Local mirror of the driver's t2 differential check.

Strictly stronger than the driver's hash compare: we materialize both
results as pandas, sort columns by name, sort rows by every column, and
require EXACT value equality (with NaN==NaN and timestamp unification).
If this passes, any order-insensitive value hash matches too.
"""

from __future__ import annotations

import math
from datetime import datetime

import pandas as pd


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        return ("f", repr(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
        return _norm_cell(v.item())
    return ("o", str(v))


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(df.iloc[i][c]) for c in cols) for i in range(len(df))]
    return sorted(rows)


def compare(spark_df, duck_rel, name: str = "") -> None:
    sp = spark_df.toPandas()
    du = duck_rel.df()
    assert sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns)), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    du.columns = [c for c in du.columns]
    # unify column case
    sp.columns = [c.lower() for c in sp.columns]
    du.columns = [c.lower() for c in du.columns]
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    nsp, ndu = normalize(sp), normalize(du)
    for i, (a, b) in enumerate(zip(nsp, ndu)):
        assert a == b, f"{name}: row {i} differs\n spark={a}\n duck ={b}"
