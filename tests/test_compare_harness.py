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


def test_decimal_scale_is_forgiven():
    # ADVICE r6: Decimal('1.5') and Decimal('1.50') are EQUAL values —
    # DuckDB and Spark may disagree on decimal scale while agreeing on
    # the value; the canon normalizes the exponent before hashing.
    import decimal

    assert_frames_match(
        _df([[decimal.Decimal("1.50")], [decimal.Decimal("1E+1")]], ["v"]),
        _df([[decimal.Decimal("1.5")], [decimal.Decimal("10")]], ["v"]),
        "t",
    )


def test_decimal_value_mismatch_fails():
    import decimal

    with pytest.raises(AssertionError):
        assert_frames_match(
            _df([[decimal.Decimal("1.5")]], ["v"]),
            _df([[decimal.Decimal("1.51")]], ["v"]),
            "t",
        )


def test_numpy_scalars_hash_like_python_scalars():
    # ADVICE r6: under numpy>=2.0 repr(np.int64(5)) is 'np.int64(5)' —
    # the canon must coerce numpy scalars so an object column of numpy
    # ints hashes equal to plain Python ints.
    import numpy as np

    s = pd.Series([np.int64(5), np.float64(1.5), np.bool_(True)], dtype=object)
    o = pd.Series([5, 1.5, True], dtype=object)
    assert_frames_match(s.to_frame("v"), o.to_frame("v"), "t")


def test_duplicate_column_names_do_not_crash():
    # ADVICE r6: pdf.dtypes[c] on a duplicated name returns a Series;
    # the compare must be positional in name-sorted order.
    a = _df([[1, "x"]], ["c", "c"])
    b = _df([[1, "x"]], ["c", "c"])
    assert_frames_match(a, b, "t")
    with pytest.raises(AssertionError):
        assert_frames_match(a, _df([[1, 2.0]], ["c", "c"]), "t")


def test_interval_like_dtype_name_not_misread_as_int():
    # ADVICE r6: _col_kind must use dtype predicates, not substring
    # matching — 'interval[int64, right]' contains 'int' but is not int.
    from ._compare import _col_kind

    iv = pd.DataFrame({"v": pd.arrays.IntervalArray.from_breaks([0, 1, 2])})
    assert _col_kind(iv, "v") != "int"
