"""Reference-faithful cast semantics (SURVEY §1.3).

The reference contract is coerce-to-NULL (`pd.to_numeric(errors=
'coerce')`, `load_warehouse.py:63-68`) and a *strict* boolean parse
(lowercased string must be exactly 'true'/'false', anything else NULL,
`load_warehouse.py:73-75`). Spark's `cast('boolean')` also accepts
t/f/y/n/yes/no/0/1, so we must not use it; `try_cast` gives the
coerce-to-NULL semantics regardless of ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_double(c: Column | str) -> Column:
    """string → double, invalid → NULL (load_warehouse.py:63-66 semantics)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.try_cast("double")


def try_int(c: Column | str) -> Column:
    """string → int, invalid → NULL (load_warehouse.py:68 semantics)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.try_cast("int")


def strict_bool(c: Column | str) -> Column:
    """lowercase ∈ {'true','false'} else NULL (load_warehouse.py:73-75).

    Deliberately NOT `cast('boolean')` — Spark's boolean cast accepts a
    wider vocabulary (t/f/y/n/yes/no/0/1) which diverges from the
    reference's pandas `.map({'true': True, 'false': False})`.
    """
    c = F.col(c) if isinstance(c, str) else c
    low = F.lower(c.cast("string"))
    return (
        F.when(low == "true", F.lit(True))
        .when(low == "false", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
