"""stdin source.

Reference: common/.../StdInSource.java:29-85 — reads lines from
standard input until the literal "exit" (case-insensitive) or stop(),
wrapping each line as an event with the line under `message`
(JacksonEvent.fromMessage).

Spark shape: stdin is a driver-local stream by definition, so the
read happens on the driver (the reference reads it on one thread
too); the lines then parallelize into a DataFrame for the pipeline.
For unbounded piping, `max_lines` bounds one micro-batch and the
caller loops — the file/http spool sources are the scalable ingest
paths; this exists for the CLI debugging role the reference gives it.
"""

from __future__ import annotations

import sys
from typing import IO

from pyspark.sql import DataFrame, SparkSession


def read_stdin(
    spark: SparkSession,
    stream: IO[str] | None = None,
    *,
    max_lines: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read lines until EOF, "exit" (the reference's sentinel), or
    `max_lines`; returns a DataFrame with one `message` row per line.
    `stream` is injectable for tests (defaults to sys.stdin)."""
    src = stream if stream is not None else sys.stdin
    lines: list[str] = []
    for raw in src:
        line = raw.rstrip("\n")
        if line.lower() == "exit":  # StdInSource.java:64
            break
        lines.append(line)
        if max_lines is not None and len(lines) >= max_lines:
            break
    df = spark.createDataFrame(
        [(ln,) for ln in lines], "message string"
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df
