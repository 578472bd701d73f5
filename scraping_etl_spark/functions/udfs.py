"""The engine's (deliberately short) Python-UDF surface.

Policy: Python UDFs are the slow path — every operator that CAN be a
built-in IS a built-in (the reference's three row-at-a-time UDFs F8/F9/
F10 are re-expressed as regexp_replace / literal-map transforms in
operators/cleaning.py). What remains here is the one operation that is
genuinely inexpressible in SQL functions — a binary re-decode — as an
Arrow-vectorized ``pandas_udf``.

NOTE: this module must NOT use ``from __future__ import annotations`` —
``pandas_udf`` resolves the ``pd.Series`` type hints at decoration time,
and stringified annotations with a function-local ``pd`` break that.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def fix_mojibake(s: pd.Series) -> pd.Series:
    """Repair latin1-as-utf8 mojibake (SURVEY F6; quirk Q6 root cause).

    Reference: ScienceDirect/ScienceDirect.py:150-156 ``decode_text`` —
    ``text.encode('latin1').decode('utf-8')`` with pass-through when the
    string is not valid mojibake.
    """

    def one(v):
        if v is None:
            return None
        try:
            return v.encode("latin1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return v

    return s.map(one)
