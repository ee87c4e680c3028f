"""RSS feed source.

Reference: rss-source plugin (RSSSource.java — schedules
RssReaderTask at `polling_frequency`, default 5 min; RssReaderTask.java
:44-67 reads the feed, converts every `<item>` to one Document event
whose payload is the item bean: guid/title/link/description/pubDate/
author/categories plus the enclosing channel fields).

Spark shape: feeds land as XML documents (file spool / object store —
the sandbox has no outbound network, so the URL fetch itself is the
out-of-scope transport, exactly like the other pull connectors); the
ITEM EXTRACTION is pure Catalyst: item fragments via
`regexp_extract_all` (one pass over the document), per-item fields via
Hive `xpath_*` on the ~1 KB fragment — no Python in the loop, scales
as a narrow map over however many feed documents the scan yields.
Polling semantics come from Structured Streaming's file source over
the spool directory (`stream_feed`) with `maxFilesPerTrigger` as the
bounded buffer, the same mirror the http source uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<item[\s>].*?</item>"

# RFC-822 pubDate, weekday prefix stripped first (Spark's parser
# rejects week-day fields in parse patterns); tried in order
_PUBDATE_FMTS = [
    "dd MMM yyyy HH:mm:ss Z",
    "dd MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm:ss Z",
]


def _xp(frag, path):
    return F.nullif(F.xpath_string(frag, F.lit(path)), F.lit(""))


def rss_items(
    df: DataFrame, source: str = "xml", feed_col: str = "feed_url"
) -> DataFrame:
    """Explode every <item> of the RSS documents in `df[source]` into
    one row per item (RssReaderTask.java:56-60 buildEventDocument):
    guid, title, link, description, pubDate (raw + parsed UTC ISO
    timestamp), author, categories, channel title/link. Carries
    `feed_col` through when present (the reference tags records by
    their source URL)."""
    xml = F.col(source)
    carry = [feed_col] if feed_col in df.columns else []
    ch = df.select(
        *carry,
        F.xpath_string(xml, F.lit("rss/channel/title")).alias(
            "channel_title"
        ),
        F.xpath_string(xml, F.lit("rss/channel/link")).alias(
            "channel_link"
        ),
        F.explode(
            F.regexp_extract_all(xml, F.lit(_ITEM_RE), 0)
        ).alias("__item"),
    )
    frag = F.col("__item")
    pubdate = _xp(frag, "item/pubDate")
    stripped = F.regexp_replace(pubdate, r"^[A-Za-z]{3},\s*", "")
    parsed = F.coalesce(
        *[F.try_to_timestamp(stripped, F.lit(f)) for f in _PUBDATE_FMTS]
    )
    return ch.select(
        *carry,
        _xp(frag, "item/guid").alias("guid"),
        F.nullif(
            F.xpath_string(frag, F.lit("item/guid/@isPermaLink")),
            F.lit(""),
        ).alias("is_perma_link"),
        _xp(frag, "item/title").alias("title"),
        _xp(frag, "item/link").alias("link"),
        _xp(frag, "item/description").alias("description"),
        pubdate.alias("pub_date"),
        # session tz is UTC (session.py) so date_format renders UTC
        F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "pub_time"
        ),
        _xp(frag, "item/author").alias("author"),
        F.xpath(frag, F.lit("item/category/text()")).alias("categories"),
        "channel_title",
        "channel_link",
    )


def read_feed(spark: SparkSession, path: str) -> DataFrame:
    """Batch read: every file under `path` is one feed document."""
    raw = spark.read.text(path, wholetext=True)
    return rss_items(
        raw.select(
            F.col("value").alias("xml"),
            F.input_file_name().alias("feed_url"),
        )
    )


def stream_feed(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """Streaming read mirroring the reference's polling loop: the file
    source discovers new feed snapshots per micro-batch
    (polling_frequency -> trigger interval; bounded-buffer ->
    maxFilesPerTrigger)."""
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    return rss_items(
        raw.select(
            F.col("value").alias("xml"),
            F.input_file_name().alias("feed_url"),
        )
    )
