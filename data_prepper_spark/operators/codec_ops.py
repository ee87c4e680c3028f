"""Codec-ish processors needing Python: decompress (gzip/zlib) and
user_agent parsing (SURVEY.md §2.4 — reference
decompress-processor/.../DecompressProcessor.java:32 (gzip only),
user-agent-processor/.../UserAgentProcessor.java:30 (uap-java)).

Both are Arrow-batched pandas UDFs (the decompress/UA work itself is
C-backed per value; no Python row logic beyond the library call).
UDFs are created lazily — pandas_udf with a DDL return type needs an
active SparkSession.
"""

from __future__ import annotations

import base64
import gzip
import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _gunzip_series(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        try:
            raw = base64.b64decode(v)
            if raw[:2] == b"\x1f\x8b":
                return gzip.decompress(raw).decode("utf-8", "replace")
            return zlib.decompress(raw).decode("utf-8", "replace")
        except Exception:
            return None

    return s.map(one)


def decompress(df: DataFrame, key: str, dest: str | None = None) -> DataFrame:
    """decompress: gunzip/inflate a base64-encoded field; undecodable
    values become NULL (callers tag via convert-style gates)."""
    fn = pandas_udf(_gunzip_series, "string")
    return df.withColumn(dest or key, fn(F.col(key)))


# minimal UA grammar: browser/version, os, device class — covers the
# reference's browser/os/device struct shape without the uap database
_UA_BROWSER = re.compile(
    r"(Firefox|Edg|OPR|Chrome|Safari|MSIE|Trident)[/ ]?([\d.]*)"
)
_UA_OS = re.compile(
    r"(Windows NT [\d.]+|Mac OS X [\d_.]+|Android [\d.]+|iPhone OS [\d_]+|Linux)"
)
_BROWSER_NAME = {
    "Edg": "Edge", "OPR": "Opera", "MSIE": "IE", "Trident": "IE",
}


def _parse_ua_series(s: pd.Series) -> pd.DataFrame:
    def one(v):
        if not v:
            return (None, None, None, None)
        m = _UA_BROWSER.search(v)
        browser = _BROWSER_NAME.get(m.group(1), m.group(1)) if m else "Other"
        version = m.group(2) if m else None
        mo = _UA_OS.search(v)
        os_ = mo.group(1).replace("_", ".") if mo else "Other"
        device = (
            "mobile"
            if ("Mobile" in v or "Android" in v or "iPhone" in v)
            else "desktop"
        )
        return (browser, version, os_, device)

    rows = s.map(one)
    return pd.DataFrame(
        rows.tolist(), columns=["browser", "browser_version", "os", "device"]
    )


def user_agent(df: DataFrame, key: str, dest: str = "user_agent") -> DataFrame:
    """user_agent: UA string -> struct<browser, browser_version, os,
    device>."""
    fn = pandas_udf(
        _parse_ua_series,
        "browser string, browser_version string, os string, device string",
    )
    return df.withColumn(dest, fn(F.col(key)))
