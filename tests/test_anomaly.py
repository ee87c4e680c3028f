"""anomaly_detector semantics (reference
anomaly-detector-processor/.../AnomalyDetectorProcessor.java): only
anomalous events emitted, deviation + grade columns added, non-verbose
suppresses runs, per-identification-key isolation, and the streaming
stateful variant matches the batch operator across micro-batches."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators.anomaly import anomaly_detector


def _series(spark, vals, group="a"):
    rows = [(group, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, i long, value double")


BASE = [10.0, 11.0] * 10  # flat alternating: sd ~ 0.5, never anomalous


def test_batch_spike_detected(spark):
    vals = BASE + [100.0] + BASE[:6]
    df = _series(spark, vals)
    out = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0, verbose=True,
    ).toPandas()
    assert list(out.i) == [20]
    assert out.grade.iloc[0] == 1.0  # z >> 2*threshold saturates
    assert out.deviation_from_expected.iloc[0][0] == pytest.approx(
        100.0 - 10.5, abs=0.2
    )


def test_batch_warmup_and_flat_never_alert(spark):
    df = _series(spark, [5.0, 500.0] + BASE)
    out = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0,
    ).toPandas()
    # the early wild value is inside the output_after warmup
    assert len(out) == 0


def test_verbose_run_suppression(spark):
    vals = BASE + [100.0, 100.0] + BASE[:6]
    df = _series(spark, vals)
    verbose = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0, verbose=True,
    ).toPandas()
    quiet = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0, verbose=False,
    ).toPandas()
    assert list(verbose.i) == [20, 21]
    assert list(quiet.i) == [20]  # leading edge only


def test_groups_isolated_and_cardinality_limit(spark):
    a = _series(spark, BASE + [100.0], "a")
    # group b is a uniform 100-series: the spike value is normal there
    b = _series(spark, [100.0, 101.0] * 10 + [100.0], "b")
    df = a.union(b)
    out = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0, verbose=True,
    ).toPandas()
    assert set(out.g) == {"a"}
    # cardinality_limit=1 keeps only the first-seen group; with equal
    # first order values the tie-break is the group key itself
    lim = anomaly_detector(
        df, ["value"], identification_keys=["g"], order_by=["i"],
        sample_size=16, output_after=8, threshold=2.0, verbose=True,
        cardinality_limit=1,
    ).toPandas()
    assert set(lim.g) <= {"a"}


def test_streaming_matches_batch_across_microbatches(spark, tmp_path):
    from data_prepper_spark.streaming.pipeline import (
        streaming_anomaly_detector,
    )

    vals = BASE + [100.0, 100.0] + BASE[:8] + [200.0] + BASE[:4]
    pdf = pd.DataFrame(
        {"g": "a", "i": range(len(vals)), "value": [float(v) for v in vals]}
    )
    src = str(tmp_path / "anom_src")
    os.makedirs(src)
    # three files in order-of-arrival; explicit mtimes pin batch order
    for n, (lo, hi) in enumerate([(0, 12), (12, 24), (24, len(vals))]):
        p = os.path.join(src, f"part{n}.parquet")
        pdf.iloc[lo:hi].to_parquet(p)
        os.utime(p, (1_700_000_000 + n, 1_700_000_000 + n))

    stream = spark.readStream.schema("g string, i long, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_anomaly_detector(
        stream, "value", "value", "i", identification_keys=["g"],
        sample_size=16, output_after=8, threshold=2.0, verbose=True,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("anom_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from anom_stream").toPandas()
        .sort_values("i").reset_index(drop=True)
    )
    want = (
        anomaly_detector(
            spark.createDataFrame(pdf), ["value"],
            identification_keys=["g"], order_by=["i"],
            sample_size=16, output_after=8, threshold=2.0, verbose=True,
        )
        .select("g", "i", "value", F.col("deviation_from_expected")[0].alias("dev"), "grade")
        .toPandas().sort_values("i").reset_index(drop=True)
    )
    assert list(got.i) == list(want.i)
    assert got.grade.round(9).tolist() == want.grade.round(9).tolist()
    assert got.deviation_from_expected.round(9).tolist() == want.dev.round(9).tolist()


def test_global_no_id_keys_chunked_matches_keyed(spark):
    """VERDICT r03 item 6: the no-identification-keys batch path must
    not route the dataset through one partition. The chunked global
    implementation must be row-identical to the (ground-truth) keyed
    path run with a constant group, for both verbose modes, at a size
    that actually chunks (several thousand rows >> sample_size)."""
    import numpy as np

    rng = np.random.RandomState(7)
    vals = (10.0 + rng.randn(3000) * 0.5).tolist()
    for spike_at in (500, 501, 1500, 2900):
        vals[spike_at] = 100.0
    df = _series(spark, vals)

    for verbose in (True, False):
        keyed = anomaly_detector(
            df, ["value"], identification_keys=["g"], order_by=["i"],
            sample_size=16, output_after=8, threshold=2.0, verbose=verbose,
        ).toPandas().sort_values("i").reset_index(drop=True)
        glob = anomaly_detector(
            df, ["value"], identification_keys=None, order_by=["i"],
            sample_size=16, output_after=8, threshold=2.0, verbose=verbose,
        ).toPandas().sort_values("i").reset_index(drop=True)
        assert list(glob.i) == list(keyed.i), (verbose, list(glob.i)[:20])
        pd.testing.assert_series_equal(
            glob.grade, keyed.grade, check_exact=False, atol=1e-9
        )
    # spikes were found at all
    assert len(keyed) > 0

    # and the chunking really happened (plan partitions by __chunk,
    # not by a literal): internal check via the helper
    from data_prepper_spark.operators.anomaly import _global_anomaly

    out = _global_anomaly(
        df, ["value"], ["i"], 16, 8, 2.0, True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


def test_global_no_id_keys_rejects_non_numeric_order(spark):
    df = spark.createDataFrame(
        [("a", "x1", 1.0)], "g string, i string, value double"
    )
    with pytest.raises(ValueError, match="numeric/temporal"):
        anomaly_detector(
            df, ["value"], identification_keys=None, order_by=["i"],
            sample_size=16, output_after=8, threshold=2.0,
        )
