"""Data Prepper processor plugins re-expressed as native DataFrame
transforms (SURVEY.md §2.4-2.7). Each function is Catalyst-friendly:
built-in pyspark.sql.functions only, no per-row Python."""

from .expression import dp_expr, translate_expr  # noqa: F401
