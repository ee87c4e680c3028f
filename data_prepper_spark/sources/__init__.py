"""Push-style sources: listeners that land data where Spark reads it.

Spark is a pull engine; the reference's push sources (http, otlp
listeners) are re-expressed as an edge listener process writing
atomic spool files that a batch read or a Structured Streaming file
source consumes. See sources/http.py.
"""

from data_prepper_spark.sources.http import HttpSource  # noqa: F401
