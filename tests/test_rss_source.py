"""RSS source (sources/rss.py) — item extraction, pubDate parsing,
streaming polling mirror. Parity target: RssReaderTask.java item ->
Document conversion."""

from __future__ import annotations

import pytest

from data_prepper_spark.sources.rss import read_feed, rss_items, stream_feed

FEED = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0">
  <channel>
    <title>Engineering Blog</title>
    <link>https://example.com/blog</link>
    <description>posts</description>
    <item>
      <guid isPermaLink="false">p-1</guid>
      <title>First Post</title>
      <link>https://example.com/blog/1</link>
      <description>Hello &amp; welcome</description>
      <pubDate>Wed, 01 Jan 2025 10:30:00 +0000</pubDate>
      <author>ann@example.com</author>
      <category>spark</category>
      <category>search</category>
    </item>
    <item>
      <guid>p-2</guid>
      <title>Second</title>
      <link>https://example.com/blog/2</link>
      <pubDate>Thu, 02 Jan 2025 03:00:00 -0500</pubDate>
    </item>
  </channel>
</rss>
"""


def test_item_extraction(spark):
    df = spark.createDataFrame([(FEED,)], "xml string")
    rows = rss_items(df).orderBy("guid").collect()
    assert len(rows) == 2
    r1, r2 = rows
    assert r1["guid"] == "p-1" and r1["is_perma_link"] == "false"
    assert r1["title"] == "First Post"
    assert r1["link"] == "https://example.com/blog/1"
    assert r1["description"] == "Hello & welcome"  # entity decoded
    assert r1["pub_date"] == "Wed, 01 Jan 2025 10:30:00 +0000"
    assert r1["pub_time"] == "2025-01-01T10:30:00Z"
    assert r1["author"] == "ann@example.com"
    assert r1["categories"] == ["spark", "search"]
    assert r1["channel_title"] == "Engineering Blog"
    assert r1["channel_link"] == "https://example.com/blog"
    # offset timezone normalizes to UTC; absent fields are NULL
    assert r2["pub_time"] == "2025-01-02T08:00:00Z"
    assert r2["author"] is None and r2["description"] is None
    assert r2["categories"] == []
    assert r2["is_perma_link"] is None


def test_read_feed_batch(spark, tmp_path):
    (tmp_path / "feed1.xml").write_text(FEED)
    (tmp_path / "feed2.xml").write_text(
        FEED.replace("p-1", "q-1").replace("p-2", "q-2")
    )
    out = read_feed(spark, str(tmp_path))
    assert out.count() == 4
    assert out.where("guid = 'q-1'").count() == 1
    # feed_url carries the provenance (reference tags by source URL)
    urls = {r["feed_url"].rsplit("/", 1)[-1] for r in out.collect()}
    assert urls == {"feed1.xml", "feed2.xml"}


def test_stream_feed_polling(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "t0.xml").write_text(FEED)
    q = (
        stream_feed(spark, str(spool))
        .writeStream.format("memory")
        .queryName("rss_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT guid FROM rss_stream ORDER BY guid").collect()
    assert [r["guid"] for r in got] == ["p-1", "p-2"]


def test_malformed_feed_yields_no_items(spark):
    df = spark.createDataFrame(
        [("<html>not a feed</html>",), ("",)], "xml string"
    )
    assert rss_items(df).count() == 0
