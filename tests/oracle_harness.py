"""Local mirror of the driver's t2 differential check.

Strictly stronger than the driver's hash compare: both results are
materialized as pandas, columns sorted by name, every value canonized
to a string (NaN/None → sentinel, timestamps → UTC ns, ints → decimal
string, floats → repr), rows sorted, exact equality required.
Vectorized enough to run at sf0.1 row counts (600k+) in seconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_NULL = "\0NULL"


def _tz_aware(s: pd.Series) -> bool:
    if pd.api.types.is_datetime64_any_dtype(s):
        return getattr(s.dtype, "tz", None) is not None
    if s.dtype == object:
        for v in s:
            if isinstance(v, pd.Timestamp):
                return v.tzinfo is not None
    return False


def _canon_col(s: pd.Series) -> pd.Series:
    """Canonical string representation, identical across engines for
    semantically identical values (int64 vs hugeint, ts dtypes, ...)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        ns = s.astype("datetime64[ns]")
        out = ns.astype("int64").astype(str)
        out[ns.isna()] = _NULL
        return out
    if pd.api.types.is_bool_dtype(s):
        return s.astype("int64").astype(str)
    if pd.api.types.is_integer_dtype(s):
        return s.astype("int64").astype(str)
    if pd.api.types.is_float_dtype(s):
        return s.map(lambda v: _NULL if pd.isna(v) else repr(float(v)))

    def conv(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return _NULL
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating)):
            return repr(float(v))
        if isinstance(v, pd.Timestamp):
            t = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
            return str(t.value)
        return str(v)

    return s.map(conv)


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = _canon_col(df[c])
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, duck_rel, name: str = "") -> None:
    sp = spark_df.toPandas()
    du = duck_rel.df()
    assert sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns)), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    # Driver-strict: a tz-aware oracle column vs a naive Spark column is a
    # SCHEMA mismatch (the driver fails it) — refuse to normalize it away.
    sp_tz = {c.lower(): _tz_aware(sp[c]) for c in sp.columns}
    du_tz = {c.lower(): _tz_aware(du[c]) for c in du.columns}
    for c in sp_tz:
        assert sp_tz[c] == du_tz.get(c, sp_tz[c]), (
            f"{name}: tz-awareness mismatch on column {c!r}: "
            f"spark tz-aware={sp_tz[c]} oracle tz-aware={du_tz.get(c)} "
            f"(use a naive TIMESTAMP in the oracle, e.g. make_timestamp/"
            f"date_trunc, not to_timestamp which yields TIMESTAMPTZ)"
        )
    nsp, ndu = normalize_frame(sp), normalize_frame(du)
    for c in nsp.columns:
        a, b = nsp[c].to_numpy(), ndu[c].to_numpy()
        if not np.array_equal(a, b):
            bad = np.nonzero(a != b)[0][:3]
            detail = [(int(i), a[i], b[i]) for i in bad]
            raise AssertionError(f"{name}: column {c!r} differs at rows {detail}")
