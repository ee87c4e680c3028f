import base64
import gzip

from data_prepper_spark.operators.codec_ops import decompress, user_agent


def test_decompress_gzip_and_bad_input(spark):
    payload = base64.b64encode(gzip.compress(b"hello world")).decode()
    df = spark.createDataFrame([(payload,), ("!!notb64!!",), (None,)], "c string")
    out = [r.c for r in decompress(df, "c").collect()]
    assert out == ["hello world", None, None]


def test_user_agent_struct(spark):
    uas = [
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) "
        "AppleWebKit/605.1.15 Mobile/15E148 Safari/604.1",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in uas], "ua string")
    rows = user_agent(df, "ua").select("user_agent.*").collect()
    assert rows[0].browser == "Chrome" and rows[0].device == "desktop"
    assert rows[0].os.startswith("Windows NT")
    assert rows[1].device == "mobile" and "iPhone OS" in rows[1].os
    assert rows[2].browser is None
