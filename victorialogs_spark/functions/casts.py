"""try_cast helper: pyspark exposes try_cast as a Column method (3.5+), not
as a function — wrap it so call sites read naturally."""

from __future__ import annotations

from pyspark.sql import Column


def _try_cast(c: Column, dtype: str) -> Column:
    return c.try_cast(dtype)
