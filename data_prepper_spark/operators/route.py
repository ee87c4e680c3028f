"""Conditional routing + drop_events (SURVEY.md §2.7).

Reference: routes are named expressions evaluated per event
(core/pipeline/router/RouteEventEvaluator.java:38-76); an event may
match multiple routes and is COPIED per matching sink
(RouterCopyRecordStrategy.java); unmatched events go to _default
(Router.java:62-75). Spark form: one filtered branch per route over a
shared (cacheable) upstream — copies are logical, not physical.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .expression import dp_expr


def apply_routes(
    df: DataFrame, routes: dict[str, str], cache: bool = False
) -> dict[str, DataFrame]:
    """routes: name -> Data Prepper expression. Returns one DataFrame
    per route plus '_default' (rows matching no route)."""
    if cache:
        df = df.cache()
    out = {name: df.filter(dp_expr(expr)) for name, expr in routes.items()}
    if routes:
        matched_any = reduce(
            lambda a, b: a | b, (dp_expr(e) for e in routes.values())
        )
        out["_default"] = df.filter(~F.coalesce(matched_any, F.lit(False)))
    return out


def drop_events(df: DataFrame, drop_when: str) -> DataFrame:
    """drop_events processor (DropEventsProcessor.java:26): filter-NOT."""
    cond = dp_expr(drop_when)
    return df.filter(~F.coalesce(cond, F.lit(False)))
