"""The comparator that backs every oracle check must itself FAIL on
mismatches — a silently-lenient compare would green-light everything.
Negative controls: row count, column names, float bits, timestamp tz
normalization, and row-order insensitivity (the one thing it must
forgive)."""

from __future__ import annotations

import pandas as pd
import pytest

from ._compare import assert_frames_match


def _df(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_row_count_mismatch_fails():
    with pytest.raises(AssertionError, match="row count"):
        assert_frames_match(
            _df([[1], [2]], ["a"]), _df([[1]], ["a"]), "t"
        )


def test_column_name_mismatch_fails():
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_frames_match(_df([[1]], ["a"]), _df([[1]], ["b"]), "t")


def test_single_float_ulp_difference_fails():
    import math

    x = 0.1 + 0.2
    y = math.nextafter(x, 1.0)
    with pytest.raises(AssertionError, match="mismatching rows"):
        assert_frames_match(_df([[x]], ["a"]), _df([[y]], ["a"]), "t")


def test_row_order_is_forgiven():
    assert_frames_match(
        _df([[2, "x"], [1, "y"]], ["a", "b"]),
        _df([[1, "y"], [2, "x"]], ["a", "b"]),
        "t",
    )


def test_tz_aware_vs_naive_timestamps_MISMATCH():
    # VERDICT r5 #2: the harness must be tz-SENSITIVE — a DuckDB
    # TIMESTAMPTZ column (e.g. from to_timestamp()) must never match a
    # naive Spark TIMESTAMP, even at the same UTC instant. The old
    # leniency here masked the candle_resample driver-red.
    aware = pd.Timestamp("2024-01-01 12:00:00", tz="UTC")
    naive = pd.Timestamp("2024-01-01 12:00:00")
    with pytest.raises(AssertionError):
        assert_frames_match(_df([[aware]], ["t"]), _df([[naive]], ["t"]), "t")


def test_none_and_nan_are_equivalent():
    assert_frames_match(
        _df([[None]], ["a"]), _df([[float("nan")]], ["a"]), "t"
    )
