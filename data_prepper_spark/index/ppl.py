"""PPL (Piped Processing Language) compiler.

OpenSearch's second query surface (the SQL plugin's `_plugins/_ppl`
endpoint — what Dashboards' observability views speak; reference
users point Data Prepper output at OpenSearch and query it with PPL
as often as with the DSL). A PPL query is a source followed by a
pipeline of commands:

    source=docs | where lang = 'en' and n_chars > 200
                | stats avg(n_chars) as a, count() as c by lang
                | sort - c | head 5

This module compiles that string ONTO the DataFrame API — each
command is a declarative transformation (filter / select /
withColumn / groupBy.agg / orderBy / limit / dropDuplicates), so
Catalyst owns the physical plan: predicate pushdown, column pruning
and partial aggregation all apply exactly as if the user had written
the DataFrame chain by hand. Nothing here collects or loops.

Supported commands (the documented subset; anything else raises):

- ``source=<name>`` / ``search source=<name> <expr>`` — the live doc
  set: identity columns + every doc-values sidecar column (+
  `content` from the corpus when a later command references it).
  Tombstones are filtered (same contract as every index-backed API).
- ``where <expr>`` — boolean filter. Expressions are the SQL subset
  both engines share (=, !=, <, <=, >, >=, and/or/not, in, like,
  arithmetic, function calls); PPL's single-= equality IS Spark
  SQL's, so expressions pass to ``F.expr`` verbatim after identifier
  backtick-quoting. ``where match(content, '<text>')`` is the PPL
  relevance function: it routes to the INVERTED INDEX (the
  disjunctive match set as a semi-join on doc_id) instead of
  scanning text — the pipeline stays index-bound.
- ``fields [+|-] a, b`` — project (keep, or with ``-`` drop).
- ``eval x = <expr>`` — derived column (comma-separated pairs).
- ``rename a as b [, ...]``
- ``stats <agg> [as name] [, ...] [by f1, f2]`` — aggs: count(),
  count(f), sum/avg/min/max/stddev_samp/stddev_pop/var_samp/var_pop,
  distinct_count(f)/dc(f) (exact), percentile(f, p) (exact). A `by`
  key may be ``span(field, interval)`` — the PPL histogram bucket
  (floor(field/interval)*interval, emitted as column `span`).
- ``eventstats <agg> [as name] [, ...] [by f1, f2]`` — the same
  aggregates attached to EVERY row (a window aggregate over the
  `by` partition; rows are not collapsed).
- ``sort [+|-]f1, [+|-]f2`` — ``-`` descending (PPL convention).
- ``head N`` — limit.
- ``dedup f1 [, f2]`` — first row per key set (dropDuplicates).
- ``top [N] f [by g]`` / ``rare [N] f [by g]`` — most/least frequent
  values (count groupBy + rank window; N default 10).
- ``lookup '<parquet_path>' <key> [, <key2>]`` — enrich join against
  a side table (the PPL lookup command): LEFT join on the key
  columns, the lookup side broadcast when small (AQE's decision —
  the translate/enrich operator's shape).
- ``join [type=left|inner|semi|anti] on <k1> [, k2]
  '<parquet_path>'`` — the PPL join command (documented subset:
  equi-joins on named key columns against a parquet right side;
  semi/anti keep only the left columns — the filter-by-other-table
  idioms). Same declarative join, Catalyst/AQE pick the physical
  strategy.
- ``parse <field> '<regex>'`` — extract named groups as columns
  (regexp_extract per group — the PPL parse command).
- ``grok <field> '<pattern>'`` — route through the grok processor's
  pattern library (operators/parse.py), e.g. '%{IP:client}'.
- ``patterns <field> [new_field=<n>] [pattern='<regex>']`` — the PPL
  log-template command (simple_pattern method): the pattern is the
  text with every char matching ``pattern`` (default alphanumerics,
  ``[a-zA-Z\\d]``) removed, leaving the punctuation skeleton; one
  native regexp_replace, output column ``patterns_field`` unless
  renamed.
- ``fillnull with <literal> in f1 [, f2]`` /
  ``fillnull using f1=<literal> [, f2=<literal>]`` — null
  replacement (coalesce with the literal; literals are SQL literals).
- ``trendline [sort [+|-]<key>] sma(N, f) [as alias] [, ...]`` — the
  PPL moving-average command. ``sma`` = mean of the current row and
  the N-1 prior rows, ``wma`` = the linearly-weighted form (weight N
  for the newest). Rows before the window fills emit NULL (the PPL
  contract). Order comes from the command's own ``sort`` clause or,
  absent that, the nearest preceding ``sort`` command (required —
  a moving average over undefined order is nondeterministic). The
  window is a GLOBAL ordered frame: like OpenSearch (which computes
  trendline over the final result page), use it after the pipeline
  has narrowed the row set.
- ``expand <field> [as alias]`` — one row per element of an array
  column (explode; rows with null/empty arrays drop, matching PPL).
- ``flatten <field>`` — promote a struct column's subfields to
  top-level columns (the struct column itself is dropped).
- ``kmeans centroids=K iterations=N fields=a[,b...]`` — the PPL
  k-means command: appends ``ClusterID``. DETERMINISTIC variant of
  the plugin's sampler: seeds are the K smallest distinct field
  tuples, then N Lloyd iterations where assignment is a native
  argmin-over-literal-centroids expression (no UDF, no shuffle
  beyond one groupBy per iteration) and the new means come back as
  K driver-side floats — the 100-TB work (assignment) stays
  distributed, the driver holds K·d numbers. Euclidean only
  (``distance_type`` other than EUCLIDEAN raises). Rows with null
  fields are dropped. ``fields=`` is required (the plugin's
  all-numeric default would make results depend on upstream column
  sets).
- ``describe <index>`` — the doc view's schema as rows
  (column_name, data_type); where/fields/sort/head compose after it.
- ``ad field=<num> time_field=<col> [category_field=<col>]
  [sample_size=N] [output_after=N] [threshold=X] [verbose=true]`` —
  the PPL anomaly-detection command routed through the engine's
  anomaly_detector operator (operators/anomaly.py — trailing-window
  z-grade, the documented RCF mechanism swap): emits the anomalous
  rows with `deviation_from_expected` + `grade` appended. With
  category_field the trailing stats window partitions per category;
  without it the chunked global path runs (no single-partition
  window).

Reference: the PPL command/function set mirrors the public
opensearch-project/sql PPL documentation; this is an independent
Spark-first implementation.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _split_pipes(ppl: str) -> list[str]:
    """Split on top-level `|`, respecting single/double quotes."""
    parts, buf, q = [], [], None
    for ch in ppl:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == "|":
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


_AGG_RE = re.compile(
    r"^\s*(?P<fn>[a-z_]+)\s*\(\s*(?P<arg>[^)]*)\s*\)"
    r"(?:\s+as\s+(?P<name>\w+))?\s*$",
    re.IGNORECASE,
)


def _split_top(s: str) -> list[str]:
    """Split on commas at paren depth 0 (the regex lookahead trick
    breaks on nested calls like filter(sequence(1,3), x -> ...))."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p for p in out if p.strip()]


def _agg_col(spec: str):
    m = _AGG_RE.match(spec)
    if not m:
        raise ValueError(f"stats aggregation '{spec}'")
    fn = m.group("fn").lower()
    arg = m.group("arg").strip()
    name = m.group("name")
    if fn == "count":
        col = F.count(F.col(arg)) if arg else F.count(F.lit(1))
        dflt = f"count({arg})" if arg else "count()"
    elif fn in ("distinct_count", "dc"):
        col = F.count_distinct(F.col(arg))
        dflt = f"distinct_count({arg})"
    elif fn in (
        "sum", "avg", "min", "max",
        "stddev_samp", "stddev_pop", "var_samp", "var_pop",
    ):
        col = getattr(F, fn)(F.col(arg))
        dflt = f"{fn}({arg})"
    elif fn == "percentile":
        field, p = [a.strip() for a in arg.split(",")]
        col = F.expr(
            f"percentile(`{field}`, {float(p) / 100.0})"
        )
        dflt = f"percentile({field},{p})"
    else:
        raise NotImplementedError(f"stats function '{fn}'")
    return col, (name or dflt)


def _kmeans_assign(
    df: DataFrame, fields: list[str], k: int, iters: int
) -> DataFrame:
    """Deterministic Lloyd k-means over numeric columns: seeds = the
    k smallest distinct field tuples; each iteration is ONE
    distributed groupBy (means per cluster) + a k·d-float collect;
    assignment is a codegen argmin over literal centroids."""
    vals = [F.col(f).cast("double") for f in fields]
    for f in fields:
        df = df.filter(F.col(f).isNotNull())
    seeds = (
        df.select(*[v.alias(f"__f{i}") for i, v in enumerate(vals)])
        .distinct()
        .orderBy(*[f"__f{i}" for i in range(len(fields))])
        .limit(k)
        .collect()
    )
    cents = [[float(r[i]) for i in range(len(fields))] for r in seeds]

    def assign(cs) -> Column:
        arr = F.array(*[
            F.struct(
                sum(
                    ((v - F.lit(c[i])) * (v - F.lit(c[i]))
                     for i, v in enumerate(vals)),
                    F.lit(0.0),
                ).alias("d"),
                F.lit(ci).alias("i"),
            )
            for ci, c in enumerate(cs)
        ])
        # struct compare orders by (d, i): ties land on the lowest
        # centroid index in every engine that replays this
        return F.array_min(arr)["i"]

    for _ in range(iters):
        rows = (
            df.withColumn("__c", assign(cents))
            .groupBy("__c")
            .agg(*[
                F.avg(v).alias(f"m{i}") for i, v in enumerate(vals)
            ])
            .collect()
        )
        new = list(cents)
        for r in rows:  # empty clusters keep their old centroid
            new[r["__c"]] = [
                float(r[f"m{i}"]) for i in range(len(fields))
            ]
        cents = new
    return df.withColumn("ClusterID", assign(cents).cast("int"))


def ppl_base(
    spark: SparkSession,
    index_dir: str,
    corpus_path: str | None = None,
    with_content: bool = False,
) -> DataFrame:
    """The PPL source table: live identity rows widened with every
    doc-values column (ord-equi-join against the vocabulary-thin
    sidecar), tombstones filtered; `content` joins in from the
    corpus only when requested (column pruning then drops whatever a
    given pipeline never touches)."""
    from .query import _anti_tombstones

    ident = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "ord", "doc_id", "repo", "path", "commit"
    )
    ident = _anti_tombstones(spark, index_dir, ident, col="ord")
    try:
        dv = spark.read.parquet(os.path.join(index_dir, "docvalues"))
        ident = ident.join(dv, "ord", "left")
    except Exception:
        pass
    if with_content:
        if corpus_path is None:
            raise ValueError("this pipeline reads `content` — pass "
                             "corpus_path")
        corpus = spark.read.parquet(corpus_path).select(
            "repo", "path", "commit", "content"
        )
        ident = ident.join(corpus, ["repo", "path", "commit"], "left")
    return ident.drop("ord")


def sql_query(
    spark: SparkSession,
    index_dir: str,
    sql: str,
    corpus_path: str | None = None,
    view: str = "docs",
) -> DataFrame:
    """OpenSearch SQL plugin facade (`POST /_plugins/_sql` body
    queries): the statement runs against the live doc table —
    identity + doc-values sidecar columns, tombstones filtered —
    registered as temp view `view`, executed by Spark SQL (the
    shared ANSI SELECT subset: WHERE / GROUP BY / HAVING / ORDER BY
    / LIMIT / joins / window functions — strictly more than the
    plugin's dialect). `content` joins in from the corpus only when
    the statement references it, so column pruning keeps unrelated
    statements corpus-free."""
    base = ppl_base(
        spark, index_dir, corpus_path,
        with_content="content" in sql,
    )
    base.createOrReplaceTempView(view)
    return spark.sql(sql)


def ppl_query(
    spark: SparkSession,
    index_dir: str,
    ppl: str,
    corpus_path: str | None = None,
) -> DataFrame:
    """Compile and run one PPL pipeline (see module docstring for the
    command subset). Returns the resulting DataFrame."""
    cmds = _split_pipes(ppl)
    if not cmds:
        raise ValueError("empty PPL query")
    head = cmds[0]
    dm = re.match(r"^describe\s+\w+\s*$", head, re.IGNORECASE)
    if dm:
        # PPL describe: the doc view's schema as rows (column_name,
        # data_type) — metadata only, later piped commands (where /
        # fields / sort / head) apply to the schema table
        base = ppl_base(
            spark, index_dir, corpus_path, with_content=False
        )
        df = spark.createDataFrame(
            list(base.dtypes), "column_name string, data_type string"
        )
        for cmd in cmds[1:]:
            kw, _, rest = cmd.partition(" ")
            kw, rest = kw.lower(), rest.strip()
            if kw == "where":
                df = df.filter(F.expr(rest))
            elif kw == "fields":
                df = df.select(*[
                    c.strip() for c in rest.split(",") if c.strip()
                ])
            elif kw == "sort":
                df = df.orderBy(rest.lstrip("+").strip())
            elif kw == "head":
                df = df.limit(int(rest or 10))
            else:
                raise NotImplementedError(
                    f"PPL command '{kw}' after describe"
                )
        return df
    m = re.match(
        r"^(?:search\s+)?source\s*=\s*(\w+)\s*(.*)$", head, re.IGNORECASE
    )
    if not m:
        raise ValueError(f"PPL must start with source=...: '{head}'")
    # `where match(content, ...)` resolves through the INDEX, so it
    # must not force the corpus join — drop relevance calls before
    # sniffing for a real `content` column reference
    with_content = "content" in re.sub(
        r"match\s*\([^)]*\)", "", ppl, flags=re.IGNORECASE
    )
    df = ppl_base(
        spark, index_dir, corpus_path, with_content=with_content
    )
    if m.group(2).strip():
        df = df.filter(F.expr(m.group(2).strip()))
    last_sort: list[tuple[str, bool]] = []
    for cmd in cmds[1:]:
        kw, _, rest = cmd.partition(" ")
        kw = kw.lower()
        rest = rest.strip()
        if kw == "where":
            mm = re.match(
                r"^match\s*\(\s*(\w+)\s*,\s*'([^']*)'\s*\)\s*$",
                rest, re.IGNORECASE,
            )
            if mm:
                # PPL relevance function: the match set comes from
                # the inverted index (bucket-pruned postings scan),
                # never a text scan — one doc_id semi-join
                from . import query as q

                stats = q.load_stats(index_dir)
                qt = q.query_terms(
                    spark, index_dir,
                    spark.createDataFrame(
                        [(0, mm.group(2))],
                        "query_id long, query string",
                    ),
                    stats["n_docs"], stats=stats,
                ).select("query_id", "term_id", "idf", "bucket")
                ords = q._match_set(spark, index_dir, qt).select("ord")
                ident = spark.read.parquet(
                    os.path.join(index_dir, "docs")
                ).select("ord", "doc_id")
                mids = ords.join(ident, "ord").select("doc_id")
                df = df.join(mids, "doc_id", "left_semi")
            else:
                df = df.filter(F.expr(rest))
        elif kw == "fields":
            drop = rest.startswith("-")
            cols = [
                c.strip()
                for c in rest.lstrip("+-").split(",") if c.strip()
            ]
            df = df.drop(*cols) if drop else df.select(*cols)
        elif kw == "eval":
            # comma-split at top level (no nested-paren commas in
            # the supported subset beyond function calls)
            for pair in _split_top(rest):
                name, _, expr = pair.partition("=")
                df = df.withColumn(
                    name.strip(), F.expr(expr.strip())
                )
        elif kw == "rename":
            for pair in rest.split(","):
                pm = re.match(
                    r"^\s*(\w+)\s+as\s+(\w+)\s*$", pair, re.IGNORECASE
                )
                if not pm:
                    raise ValueError(f"rename clause '{pair}'")
                df = df.withColumnRenamed(pm.group(1), pm.group(2))
        elif kw in ("stats", "eventstats"):
            parts = re.split(
                r"\s+by\s+", rest, maxsplit=1, flags=re.IGNORECASE
            )
            agg_part = parts[0]
            by_cols = []
            if len(parts) > 1:
                for c in _split_top(parts[1]):
                    c = c.strip()
                    sm = re.match(
                        r"^span\s*\(\s*(\w+)\s*,\s*([\d.]+)\s*\)$",
                        c, re.IGNORECASE,
                    )
                    if sm:
                        step = float(sm.group(2))
                        df = df.withColumn(
                            "span",
                            F.floor(
                                F.col(sm.group(1)).cast("double")
                                / F.lit(step)
                            ) * F.lit(step),
                        )
                        by_cols.append("span")
                    else:
                        by_cols.append(c)
            aggs = [
                _agg_col(a)
                for a in _split_top(agg_part)
                if a.strip()
            ]
            if kw == "eventstats":
                from pyspark.sql import Window

                w = (
                    Window.partitionBy(*by_cols)
                    if by_cols else Window.partitionBy(F.lit(1))
                )
                for col, nm in aggs:
                    df = df.withColumn(nm, col.over(w))
            else:
                named = [col.alias(nm) for col, nm in aggs]
                df = (
                    df.groupBy(*by_cols).agg(*named)
                    if by_cols else df.agg(*named)
                )
        elif kw == "sort":
            keys = []
            last_sort = []
            for c in rest.split(","):
                c = c.strip()
                if c.startswith("-"):
                    keys.append(F.desc(c[1:].strip()))
                    last_sort.append((c[1:].strip(), False))
                else:
                    nm = c.lstrip("+").strip()
                    keys.append(F.asc(nm))
                    last_sort.append((nm, True))
            df = df.orderBy(*keys)
        elif kw == "head":
            df = df.limit(int(rest or 10))
        elif kw == "dedup":
            cols = [c.strip() for c in rest.split(",") if c.strip()]
            df = df.dropDuplicates(cols)
        elif kw in ("top", "rare"):
            tm = re.match(
                r"^(?:(\d+)\s+)?([\w,\s]+?)(?:\s+by\s+([\w,\s]+))?$",
                rest, re.IGNORECASE,
            )
            if not tm:
                raise ValueError(f"{kw} clause '{rest}'")
            n = int(tm.group(1) or 10)
            fields = [c.strip() for c in tm.group(2).split(",")]
            bys = (
                [c.strip() for c in tm.group(3).split(",")]
                if tm.group(3) else []
            )
            from pyspark.sql import Window

            counted = df.groupBy(*(bys + fields)).agg(
                F.count(F.lit(1)).alias("count")
            )
            order = (
                F.desc("count") if kw == "top" else F.asc("count")
            )
            w = Window.partitionBy(*bys).orderBy(
                order, *[F.asc(f) for f in fields]
            )
            df = (
                counted.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= n)
                .drop("_r")
            )
        elif kw == "join":
            jm = re.match(
                r"^(?:type\s*=\s*(\w+)\s+)?on\s+([\w,\s]+?)\s+"
                r"'([^']+)'\s*$",
                rest, re.IGNORECASE,
            )
            if not jm:
                raise ValueError(f"join clause '{rest}'")
            how = (jm.group(1) or "inner").lower()
            how = {
                "left": "left", "inner": "inner",
                "semi": "left_semi", "anti": "left_anti",
            }.get(how)
            if how is None:
                raise ValueError(
                    f"join type '{jm.group(1)}' "
                    "(left|inner|semi|anti)"
                )
            keys = [c.strip() for c in jm.group(2).split(",")]
            side = spark.read.parquet(jm.group(3))
            df = df.join(side, keys, how)
        elif kw == "lookup":
            lm = re.match(
                r"^'([^']+)'\s+([\w,\s]+)$", rest
            )
            if not lm:
                raise ValueError(f"lookup clause '{rest}'")
            keys = [c.strip() for c in lm.group(2).split(",")]
            side = spark.read.parquet(lm.group(1))
            df = df.join(side, keys, "left")
        elif kw == "parse":
            pm = re.match(
                r"^(\w+)\s+'(.*)'\s*$", rest, re.DOTALL
            )
            if not pm:
                raise ValueError(f"parse clause '{rest}'")
            field, pattern = pm.group(1), pm.group(2)
            for gi, gname in enumerate(
                re.findall(r"\(\?P?<(\w+)>", pattern), start=1
            ):
                df = df.withColumn(
                    gname,
                    F.regexp_extract(F.col(field), pattern, gi),
                )
        elif kw == "grok":
            pm = re.match(r"^(\w+)\s+'(.*)'\s*$", rest, re.DOTALL)
            if not pm:
                raise ValueError(f"grok clause '{rest}'")
            from ..operators.parse import grok

            df = grok(df, source=pm.group(1), pattern=pm.group(2))
        elif kw == "patterns":
            pm = re.match(
                r"^(\w+)"
                r"(?:\s+new_field\s*=\s*'?(\w+)'?)?"
                r"(?:\s+pattern\s*=\s*'([^']*)')?\s*$",
                rest,
            )
            if not pm:
                raise ValueError(f"patterns clause '{rest}'")
            out = pm.group(2) or "patterns_field"
            rex = pm.group(3) or r"[a-zA-Z\d]"
            df = df.withColumn(
                out, F.regexp_replace(F.col(pm.group(1)), rex, "")
            )
        elif kw == "fillnull":
            um = re.match(r"^using\s+(.*)$", rest, re.IGNORECASE)
            wm = re.match(
                r"^with\s+(.+?)\s+in\s+([\w,\s]+)$", rest,
                re.IGNORECASE,
            )
            if um:
                for pair in _split_top(um.group(1)):
                    name, _, lit = pair.partition("=")
                    name = name.strip()
                    df = df.withColumn(
                        name,
                        F.coalesce(F.col(name), F.expr(lit.strip())),
                    )
            elif wm:
                lit = F.expr(wm.group(1).strip())
                for c in wm.group(2).split(","):
                    c = c.strip()
                    df = df.withColumn(c, F.coalesce(F.col(c), lit))
            else:
                raise ValueError(f"fillnull clause '{rest}'")
        elif kw == "trendline":
            from pyspark.sql import Window

            sm = re.match(
                r"^sort\s+([+-]?)\s*(\w+)\s+(.*)$", rest,
                re.IGNORECASE,
            )
            if sm:
                order = [
                    F.desc(sm.group(2))
                    if sm.group(1) == "-" else F.asc(sm.group(2))
                ]
                rest = sm.group(3)
            elif last_sort:
                order = [
                    F.asc(n) if a else F.desc(n)
                    for n, a in last_sort
                ]
            else:
                raise ValueError(
                    "trendline needs its own `sort <key>` clause or "
                    "a preceding sort command (moving averages over "
                    "undefined order are nondeterministic)"
                )
            for spec in _split_top(rest):
                tm = re.match(
                    r"^\s*(sma|wma)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
                    r"(?:\s+as\s+(\w+))?\s*$",
                    spec, re.IGNORECASE,
                )
                if not tm:
                    raise ValueError(f"trendline spec '{spec}'")
                kind = tm.group(1).lower()
                n = int(tm.group(2))
                fld = tm.group(3)
                alias = tm.group(4) or f"{fld}_trendline"
                wn = Window.orderBy(*order).rowsBetween(-(n - 1), 0)
                vals = F.collect_list(
                    F.col(fld).cast("double")
                ).over(wn)
                if kind == "sma":
                    avg = F.aggregate(
                        vals, F.lit(0.0), lambda a, x: a + x
                    ) / F.lit(float(n))
                else:
                    # linear weights 1..n, newest element heaviest;
                    # collect_list over the frame is oldest-first
                    avg = F.aggregate(
                        F.zip_with(
                            vals,
                            F.sequence(F.lit(1), F.lit(n)),
                            lambda x, i: x * i.cast("double"),
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    ) / F.lit(float(n * (n + 1) / 2))
                df = df.withColumn(
                    alias,
                    F.when(F.size(vals) == n, avg),
                )
        elif kw == "expand":
            em = re.match(
                r"^(\w+)(?:\s+as\s+(\w+))?\s*$", rest, re.IGNORECASE
            )
            if not em:
                raise ValueError(f"expand clause '{rest}'")
            fld, alias = em.group(1), em.group(2) or em.group(1)
            df = df.withColumn("__x", F.explode(F.col(fld)))
            df = df.drop(fld).withColumnRenamed("__x", alias)
        elif kw == "kmeans":
            opts = dict(re.findall(
                r"(\w+)\s*=\s*'?([\w.,+-]+)'?", rest
            ))
            if opts.get(
                "distance_type", "EUCLIDEAN"
            ).upper() != "EUCLIDEAN":
                raise NotImplementedError(
                    f"kmeans distance_type "
                    f"'{opts['distance_type']}'"
                )
            if "fields" not in opts:
                raise ValueError(
                    "kmeans needs fields=a[,b...] (explicit for "
                    "deterministic clustering)"
                )
            df = _kmeans_assign(
                df,
                [c.strip() for c in opts["fields"].split(",")],
                int(opts.get("centroids", 4)),
                int(opts.get("iterations", 1)),
            )
        elif kw == "ad":
            from ..operators.anomaly import anomaly_detector

            opts = dict(re.findall(
                r"(\w+)\s*=\s*'?([\w.+-]+)'?", rest
            ))
            if "field" not in opts or "time_field" not in opts:
                raise ValueError(
                    "ad needs field= and time_field= (batch anomaly "
                    "grading requires a deterministic order)"
                )
            df = anomaly_detector(
                df,
                keys=[opts["field"]],
                identification_keys=(
                    [opts["category_field"]]
                    if "category_field" in opts else None
                ),
                order_by=[opts["time_field"]],
                sample_size=int(opts.get("sample_size", 256)),
                output_after=int(opts.get("output_after", 32)),
                threshold=float(opts.get("threshold", 3.0)),
                verbose=opts.get("verbose", "false").lower()
                == "true",
            )
        elif kw == "flatten":
            fld = rest.strip()
            sub = [
                f.name
                for f in df.schema[fld].dataType.fields  # type: ignore[union-attr]
            ]
            df = df.select(
                "*", *[F.col(f"{fld}.{s}").alias(s) for s in sub]
            ).drop(fld)
        else:
            raise NotImplementedError(f"PPL command '{kw}'")
    return df
