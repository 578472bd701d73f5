"""The engine's (deliberately short) Python-UDF surface.

Policy: Python UDFs are the slow path — every operator that CAN be a
built-in IS a built-in (the reference's three row-at-a-time UDFs F8/F9/
F10 are re-expressed as regexp_replace / literal-map transforms in
operators/cleaning.py). What remains here is the one operation that is
genuinely inexpressible in SQL functions — a binary re-decode — as an
Arrow-vectorized ``pandas_udf``.

Notes:
- no ``from __future__ import annotations`` here: ``pandas_udf``
  resolves the ``pd.Series`` type hints at decoration time, and
  stringified annotations with a module-local ``pd`` break that;
- the UDF is built lazily (cached factory) because ``pandas_udf``
  parses its return type through the active SparkContext — decorating
  at import time would make a plain ``import scraping_etl_spark``
  require a running session.
"""

import functools

import pandas as pd
from pyspark.sql.functions import pandas_udf


@functools.lru_cache(maxsize=1)
def fix_mojibake():
    """Vectorized latin1-as-utf8 mojibake repair (SURVEY F6; quirk Q6
    root cause).

    Reference: ScienceDirect/ScienceDirect.py:150-156 ``decode_text`` —
    ``text.encode('latin1').decode('utf-8')`` with pass-through when the
    string is not valid mojibake. Returns the pandas UDF (build lazily,
    under an active session).
    """

    @pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return v.encode("latin1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return v

        return s.map(one)

    return _fix


@functools.lru_cache(maxsize=1)
def sanitize_unicode_escape():
    """F7 compat flag: the reference's recursive unicode-escape
    "sanitize" (ScienceDirect.py:440-455, IEEE.py:387-402) —
    ``encode('utf-8').decode('unicode_escape')`` per string. This is a
    documented BUG-COMPAT reproduction: the round-trip is itself the
    mojibake *source* (quirk Q6 — "BjÃ¶rn" in the shipped authors.csv);
    the engine's default pipeline never calls it. Only for byte-parity
    replays against reference outputs."""

    @pandas_udf("string")
    def _sanitize(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return v.encode("utf-8").decode("unicode_escape")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return v

        return s.map(one)

    return _sanitize
