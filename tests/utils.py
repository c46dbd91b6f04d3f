"""Spark-vs-DuckDB comparison helpers, mirroring the driver's correctness gate
(row count + schema + order-insensitive value comparison) and the reference's
golden-comparison philosophy (/root/reference/tests/utils.py:107-135) in
element-wise-allclose form (the reference's sum-based all_close at
tests/utils.py:102-104 is acknowledged-weak; we use proper np.allclose)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=1e-9, atol=1e-9):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            mask = pd.isna(av)
            assert (mask == pd.isna(bv)).all(), f"null mismatch in {c}"
            assert np.allclose(av[~mask].astype(float), bv[~mask].astype(float), rtol=rtol, atol=atol), f"value mismatch in {c}"
        else:
            assert (pd.Series(av).fillna("∅") == pd.Series(bv).fillna("∅")).all(), f"value mismatch in {c}"
