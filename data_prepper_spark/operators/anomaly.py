"""`anomaly_detector` processor (SURVEY.md §2.4; reference
anomaly-detector-processor/.../AnomalyDetectorProcessor.java:38 and
modes/RandomCutForestMode.java:37).

The reference keeps one ThresholdedRandomCutForest per distinct
identification-key tuple and, for each arriving event, scores the
numeric `keys` against the forest's learned distribution; anomalous
events are re-emitted with `deviation_from_expected` (per-key array)
and `grade` ∈ (0, 1] added (RandomCutForestMode.java:137-150), all
other events are dropped. With `verbose=false` (the default) the
forest auto-adjusts so only the leading edge of a sustained shift
alerts; `verbose=true` keeps alerting through the run
(AnomalyDetectorProcessorConfig.java:49-52). `cardinality_limit`
bounds the number of per-group models (default 5000); overflow groups
are skipped (AnomalyDetectorProcessor.java:94-100).

Spark-first recast — mechanism-equivalent, not an RCF port: RCF is a
streaming ensemble whose scores depend on sampled tree state and are
not reproducible declaratively, so the detector here scores each
event against a TRAILING WINDOW of the previous `sample_size` values
within its identification group (the same "learned from recent
history, normalized" shape RCF's NORMALIZE transform gives):

    expected_k = avg(key_k)  over the trailing window
    sd_k       = stddev_samp over the trailing window
    z_k        = |key_k - expected_k| / sd_k
    grade      = min(1, max(0, max_k z_k / threshold - 1))

so grade hits 0 at `threshold` sigmas and saturates at 1 at
2×`threshold` sigmas — a deterministic analog of the RCF anomaly
grade. All of it is window functions over one hash exchange on the
identification keys (exactly the shuffle the reference's
RequiresPeerForwarding declares), codegen-friendly, no Python. The
streaming variant (streaming.anomaly.streaming_anomaly_detector)
keeps the same math over an applyInPandasWithState per-group state
deque — the true analog of the reference's per-forest mutable state.

Documented divergences: scores are rolling z-scores, not RCF grades
(values differ; the anomalous/normal decision shape matches);
`output_after` is the reference's outputAfter warmup
(RandomCutForestModeConfig sampleSize/outputAfter defaults 256/32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEVIATION_KEY = "deviation_from_expected"
GRADE_KEY = "grade"


def anomaly_detector(
    df: DataFrame,
    keys: list[str],
    identification_keys: list[str] | None = None,
    order_by: list[str] | None = None,
    sample_size: int = 256,
    output_after: int = 32,
    threshold: float = 3.0,
    verbose: bool = False,
    cardinality_limit: int | None = None,
) -> DataFrame:
    """Emit only anomalous events, with `deviation_from_expected`
    (array<double>, one per key) and `grade` (double ∈ (0,1]) columns
    added — the reference processor's output contract
    (AnomalyDetectorProcessor.java:40-41, RandomCutForestMode.java:146-149).

    `order_by` fixes the within-group event order (the reference sees
    arrival order; batch needs an explicit deterministic column, e.g.
    the event id). Events whose keys are null are dropped, as the
    reference does (RandomCutForestMode.java:122-124).
    """
    if not keys:
        raise ValueError("anomaly_detector requires at least one key")
    if not order_by:
        raise ValueError("batch anomaly_detector requires order_by")
    id_keys = list(identification_keys or [])
    for k in keys:
        df = df.filter(F.col(k).isNotNull())

    if cardinality_limit is not None and id_keys:
        # reference: groups beyond the limit (by first arrival) are
        # skipped. First-seen per group is an agg; the top-N groups a
        # sort-limit (driver-bounded at `cardinality_limit` rows) that
        # broadcast-semi-joins back — no global window stage.
        first_seen = (
            df.groupBy(*id_keys)
            .agg(*[F.min(o).alias(f"__fs_{o}") for o in order_by])
            .orderBy(*[f"__fs_{o}" for o in order_by], *id_keys)
            .limit(cardinality_limit)
            .select(*id_keys)
        )
        df = df.join(F.broadcast(first_seen), id_keys, "left_semi")

    part = [F.col(k) for k in id_keys] if id_keys else [F.lit(31)]
    w = Window.partitionBy(*part).orderBy(*order_by)
    trail = w.rowsBetween(-sample_size, -1)

    devs: list[Column] = []
    zs: list[Column] = []
    for k in keys:
        mu = F.avg(F.col(k).cast("double")).over(trail)
        sd = F.stddev_samp(F.col(k).cast("double")).over(trail)
        dev = F.col(k).cast("double") - mu
        devs.append(dev)
        zs.append(
            F.when(sd > 0, F.abs(dev) / sd).otherwise(F.lit(None))
        )
    z = zs[0] if len(zs) == 1 else F.greatest(*zs)
    grade = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), z / F.lit(threshold) - 1.0)
    )
    scored = df.select(
        "*",
        F.array(*devs).alias(DEVIATION_KEY),
        grade.alias(GRADE_KEY),
        F.row_number().over(w).alias("__rn"),
    )
    is_anom = (F.col(GRADE_KEY) > 0) & (F.col("__rn") > output_after)
    scored = scored.withColumn("__anom", is_anom)
    if not verbose:
        # non-verbose: only the leading edge of a run of consecutive
        # anomalies alerts (the reference's auto-adjust shape).
        scored = scored.withColumn(
            "__prev", F.coalesce(F.lag("__anom").over(w), F.lit(False))
        ).filter(F.col("__anom") & ~F.col("__prev")).drop("__prev")
    else:
        scored = scored.filter(F.col("__anom"))
    return scored.drop("__rn", "__anom")
