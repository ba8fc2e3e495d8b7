"""Explicit StructTypes for every table the engine reads or writes.

The reference has no DDL — its schemas are implicit in INSERT column
lists and dict keys (SURVEY.md §1.3). Here they are explicit and
importable; ingestion adapters and sinks build DataFrames against these,
never against inferred schemas. Domain schemas follow FIXTURES.md §A
(column sets cited to the reference), benchmark schemas follow
FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


# --- bronze/silver domain tables (FIXTURES.md §A) ---------------------------

# A1: hourly candles (reference binance_ohlc_*; binance.py:102-114)
OHLC_1H = _s(
    ("open_time", T.TimestampType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("volume", T.DoubleType()),
    ("symbol", T.StringType()),
    ("created_at", T.TimestampType()),
)

# A3: 1-minute candles (binance_1m.py:123-135)
OHLC_1M = _s(
    ("timestamp", T.TimestampType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("volume", T.DoubleType()),
    ("symbol", T.StringType()),
    ("updated_at", T.TimestampType()),
)

# A4: option trades (deribit.py:96-111,122-127)
OPTION_TRADES = _s(
    ("trade_id", T.StringType()),
    ("trade_seq", T.LongType()),
    ("timestamp", T.TimestampType()),
    ("instrument_name", T.StringType()),
    ("expiry_date", T.DateType()),
    ("strike", T.IntegerType()),
    ("option_type", T.StringType()),
    ("direction", T.StringType()),
    ("price", T.DoubleType()),
    ("amount", T.DoubleType()),
    ("iv", T.DoubleType()),
    ("mark_price", T.DoubleType()),
    ("index_price", T.DoubleType()),
    ("tick_direction", T.IntegerType()),
)

# --- gold tables (FIXTURES.md §A5) ------------------------------------------

_SESSION_CORE = (
    ("instrument", T.StringType()),
    ("datetime", T.TimestampType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("move", T.DoubleType()),
    ("chhigh", T.DoubleType()),
    ("chlow", T.DoubleType()),
    ("chclose", T.DoubleType()),
    ("chmax", T.DoubleType()),
    ("chhightime", T.LongType()),   # positional index, not a timestamp
    ("chlowtime", T.LongType()),
    ("firstextremumtype", T.StringType()),  # 'HIGH' | 'LOW'
)

DAILY_SESSIONS = _s(*_SESSION_CORE, ("source", T.StringType()),
                    ("session_hours", T.IntegerType()))
WEEKLY_SESSIONS = DAILY_SESSIONS
MONTHLY_SESSIONS = _s(
    *_SESSION_CORE,
    ("source", T.StringType()),
    ("counthours", T.IntegerType()),
    ("countdays", T.IntegerType()),
    ("session_end", T.TimestampType()),
    ("year", T.IntegerType()),
    ("month", T.IntegerType()),
)

OPTION_OHLC_HOURLY = _s(
    ("hour_timestamp", T.TimestampType()),
    ("instrument_name", T.StringType()),
    ("expiry_date", T.DateType()),
    ("strike", T.IntegerType()),
    ("option_type", T.StringType()),
    ("open_price", T.DoubleType()),
    ("high_price", T.DoubleType()),
    ("low_price", T.DoubleType()),
    ("close_price", T.DoubleType()),
    ("open_iv", T.DoubleType()),
    ("high_iv", T.DoubleType()),
    ("low_iv", T.DoubleType()),
    ("close_iv", T.DoubleType()),
    ("vwap", T.DoubleType()),
    ("volume", T.DoubleType()),
    ("trade_count", T.LongType()),
    ("trade_ids", T.StringType()),  # time-ordered CSV
    ("mark_price_open", T.DoubleType()),
    ("mark_price_high", T.DoubleType()),
    ("mark_price_low", T.DoubleType()),
    ("mark_price_close", T.DoubleType()),
    ("index_price", T.DoubleType()),
    ("hours_to_expiry", T.LongType()),
    ("distance", T.DoubleType()),
)

# --- benchmark tables (FIXTURES.md §B; events.ts normalized from nanos) -----

EVENTS = _s(
    ("event_id", T.LongType()),
    ("ts", T.TimestampType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)

DOCUMENTS = _s(
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
)

EMBEDDINGS = _s(
    ("vec_id", T.LongType()),
    ("embedding", T.ArrayType(T.FloatType())),
    ("label", T.IntegerType()),
)

# media adapter output (operators/multimodal.py)
MEDIA = _s(
    ("media_id", T.LongType()),
    ("kind", T.StringType()),
    ("payload", T.BinaryType()),
)
