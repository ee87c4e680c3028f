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

    if not id_keys:
        # GLOBAL trailing stats without a single-partition window (the
        # r03 scale defect: Window.partitionBy(lit) pushed the whole
        # dataset through one task) — see _global_anomaly.
        return _global_anomaly(
            df, keys, order_by, sample_size, output_after, threshold,
            verbose,
        )

    w = Window.partitionBy(*[F.col(k) for k in id_keys]).orderBy(*order_by)
    trail = w.rowsBetween(-sample_size, -1)

    devs, zs = _dev_z_cols(keys, trail)
    grade = _grade_col(zs, threshold)
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


def _dev_z_cols(keys: list[str], trail) -> tuple[list[Column], list[Column]]:
    devs: list[Column] = []
    zs: list[Column] = []
    for k in keys:
        mu = F.avg(F.col(k).cast("double")).over(trail)
        sd = F.stddev_samp(F.col(k).cast("double")).over(trail)
        dev = F.col(k).cast("double") - mu
        devs.append(dev)
        zs.append(F.when(sd > 0, F.abs(dev) / sd).otherwise(F.lit(None)))
    return devs, zs


def _grade_col(zs: list[Column], threshold: float) -> Column:
    z = zs[0] if len(zs) == 1 else F.greatest(*zs)
    return F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), z / F.lit(threshold) - 1.0)
    )


def _global_anomaly(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    sample_size: int,
    output_after: int,
    threshold: float,
    verbose: bool,
) -> DataFrame:
    """No-identification-keys batch mode as CHUNKED two-phase trailing
    stats: the stream is range-bucketed on the first order key into P
    value-monotone chunks (approxQuantile cut points — equal key
    values share a chunk, so (chunk, order_by) ordering equals global
    order_by ordering), each chunk's last `sample_size` rows are
    duplicated into the NEXT chunk as carry rows, and every window
    below partitions by chunk — P-way parallel, never one task. A
    real row's trailing frame then sees exactly its true global
    predecessors (carries supply the cross-boundary depth; chunking
    retries at P/2 until every chunk holds >= sample_size rows, so one
    carry hop always suffices). Global row numbers for the
    output_after warmup come from within-chunk row numbers plus a
    P-row broadcast offset map; the non-verbose leading-edge lag is
    filled across boundaries from each chunk's last real row (another
    P-row broadcast). The first order key must be numeric/temporal
    (it is range-bucketed by VALUE); the reference's arrival sequence
    maps to an event id, which is."""
    spark = df.sparkSession
    first = order_by[0]
    dtype = dict(df.dtypes).get(first, "")
    if not any(
        t in dtype
        for t in ("int", "long", "short", "byte", "float", "double",
                  "decimal", "date", "timestamp")
    ):
        raise ValueError(
            "global (no identification_keys) anomaly_detector needs a "
            f"numeric/temporal first order_by column; got {first}:{dtype}"
        )
    d = df.withColumn("__ord0", F.col(first).cast("double"))
    total = d.count()
    if total == 0:
        sizes = [0]
        dd = d.drop("__ord0").withColumn("__chunk", F.lit(0))
    else:
        p0 = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        P = max(1, min(p0, total // max(4 * sample_size, 1)))
        dd, sizes = None, [total]
        while P > 1:
            cuts = d.approxQuantile(
                "__ord0", [i / P for i in range(1, P)], 0.001
            )
            chunk = F.lit(0)
            for c in cuts:
                chunk = chunk + F.when(
                    F.col("__ord0") > F.lit(float(c)), 1
                ).otherwise(0)
            cand = d.withColumn("__chunk", chunk.cast("int"))
            got = {
                r["__chunk"]: r["n"]
                for r in cand.groupBy("__chunk")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            szs = [int(got.get(i, 0)) for i in range(P)]
            if min(szs) >= sample_size:
                dd, sizes = cand.drop("__ord0"), szs
                break
            P //= 2  # skewed cuts -> coarser chunks
        if dd is None:
            dd = d.drop("__ord0").withColumn("__chunk", F.lit(0))
    P = len(sizes)

    wc = Window.partitionBy("__chunk").orderBy(*order_by)
    if P > 1:
        wrev = Window.partitionBy("__chunk").orderBy(
            *[F.desc(o) for o in order_by]
        )
        carries = (
            dd.withColumn("__rrn", F.row_number().over(wrev))
            .filter(
                (F.col("__rrn") <= sample_size)
                & (F.col("__chunk") < P - 1)
            )
            .drop("__rrn")
            .withColumn("__chunk", F.col("__chunk") + 1)
            .withColumn("__carry", F.lit(True))
        )
        union = dd.withColumn("__carry", F.lit(False)).unionByName(carries)
    else:
        union = dd.withColumn("__carry", F.lit(False))

    trail = wc.rowsBetween(-sample_size, -1)
    devs, zs = _dev_z_cols(keys, trail)
    grade = _grade_col(zs, threshold)
    scored = union.select(
        "*",
        F.array(*devs).alias(DEVIATION_KEY),
        grade.alias(GRADE_KEY),
        F.row_number().over(wc).alias("__crn"),
    ).filter(~F.col("__carry"))
    meta = spark.createDataFrame(
        [
            (c, sum(sizes[:c]), 0 if c == 0 else sample_size)
            for c in range(P)
        ],
        "__chunk int, __off long, __nc int",
    )
    scored = scored.join(F.broadcast(meta), "__chunk").withColumn(
        "__rn", F.col("__off") + F.col("__crn") - F.col("__nc")
    )
    is_anom = (F.col(GRADE_KEY) > 0) & (F.col("__rn") > output_after)
    scored = scored.withColumn("__anom", is_anom)
    if verbose:
        out = scored.filter(F.col("__anom"))
    else:
        wr = Window.partitionBy("__chunk").orderBy(*order_by)
        scored = scored.withColumn("__lag", F.lag("__anom").over(wr))
        if P > 1:
            wrev2 = Window.partitionBy("__chunk").orderBy(
                *[F.desc(o) for o in order_by]
            )
            last = (
                scored.withColumn("__rr", F.row_number().over(wrev2))
                .filter(F.col("__rr") == 1)
                .select(
                    (F.col("__chunk") + 1).alias("__chunk"),
                    F.col("__anom").alias("__bprev"),
                )
            )
            scored = scored.join(F.broadcast(last), "__chunk", "left")
        else:
            scored = scored.withColumn("__bprev", F.lit(None).cast("boolean"))
        prev = F.coalesce(F.col("__lag"), F.col("__bprev"), F.lit(False))
        out = scored.filter(F.col("__anom") & ~prev).drop("__lag", "__bprev")
    return out.drop(
        "__chunk", "__carry", "__crn", "__off", "__nc", "__rn", "__anom"
    )
