"""PPL (Piped Processing Language) compiler — index/ppl.py.

The OpenSearch SQL plugin's second query surface compiled onto the
DataFrame API; expectations recomputed independently in pandas over
the same attached doc-values columns."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_prepper_spark.index.ppl import ppl_query


@pytest.fixture(scope="module")
def ppl_env(spark, index_dir, fixture_dir, corpus_pdf, tmp_path_factory):
    from data_prepper_spark.index.query import attach_doc_values

    aug = corpus_pdf.reset_index(drop=True).copy()
    aug["n_chars"] = aug.content.str.len().astype("int64")
    d = tmp_path_factory.mktemp("ppl")
    apath = str(d / "aug.parquet")
    aug.to_parquet(apath)
    attach_doc_values(
        spark, index_dir, apath, cols=("lang", "n_chars")
    )
    corpus_path = os.path.join(fixture_dir, "corpus.parquet")
    return index_dir, corpus_path, aug


def test_ppl_where_stats_sort(spark, ppl_env):
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | where n_chars > 200 and lang != 'sql' "
        "| stats avg(n_chars) as a, count() as c, "
        "distinct_count(lang) as dl by lang "
        "| sort - c, lang | head 3",
    ).toPandas()
    m = aug[(aug.n_chars > 200) & (aug.lang != "sql")]
    want = (
        m.groupby("lang")
        .agg(a=("n_chars", "mean"), c=("n_chars", "size"))
        .reset_index()
        .assign(dl=1)
        .sort_values(["c", "lang"], ascending=[False, True],
                     kind="mergesort")
        .head(3)
        .reset_index(drop=True)
    )
    assert got.lang.tolist() == want.lang.tolist()
    assert got.c.tolist() == want.c.tolist()
    assert got.a.tolist() == pytest.approx(want.a.tolist())
    assert got.dl.tolist() == [1, 1, 1]


def test_ppl_eval_fields_rename_dedup_head(spark, ppl_env):
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | eval kb = n_chars / 1000.0, "
        "tag = concat(lang, '-x') "
        "| rename n_chars as size | fields lang, size, kb, tag "
        "| dedup lang | sort lang",
    ).toPandas()
    assert got.columns.tolist() == ["lang", "size", "kb", "tag"]
    assert got.lang.tolist() == sorted(aug.lang.unique())
    for r in got.itertuples():
        # Spark parses the 1000.0 literal as DECIMAL in ANSI mode
        assert float(r.kb) == pytest.approx(r.size / 1000.0)
        assert r.tag == f"{r.lang}-x"


def test_ppl_top_rare(spark, ppl_env):
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx, "source=docs | top 2 lang",
    ).toPandas()
    vc = aug.lang.value_counts()
    # rank with lang tie-break ascending
    want = (
        vc.rename_axis("lang").reset_index(name="count")
        .sort_values(["count", "lang"], ascending=[False, True],
                     kind="mergesort")
        .head(2)
    )
    assert got.sort_values("count", ascending=False).lang.tolist() == \
        want.lang.tolist()
    rare = ppl_query(
        spark, idx, "source=docs | rare 2 lang",
    ).toPandas()
    wr = (
        vc.rename_axis("lang").reset_index(name="count")
        .sort_values(["count", "lang"], ascending=[True, True],
                     kind="mergesort")
        .head(2)
    )
    assert rare.sort_values("count").lang.tolist() == wr.lang.tolist()


def test_ppl_search_filter_percentile_parse(spark, ppl_env):
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "search source=docs lang = 'python' "
        "| stats percentile(n_chars, 50) as p50, count() as c",
    ).toPandas()
    m = aug[aug.lang == "python"]
    assert got.c.iloc[0] == len(m)
    import numpy as np

    assert got.p50.iloc[0] == pytest.approx(
        float(np.percentile(m.n_chars, 50, method="linear"))
    )

    # parse named groups out of path
    got = ppl_query(
        spark, idx,
        r"source=docs | parse path 'src/(?<pkg>\w+)/(?<file>[\w.]+)' "
        "| fields path, pkg, file | sort path | head 5",
    ).toPandas()
    import re as _re

    for r in got.itertuples():
        m2 = _re.search(r"src/(\w+)/([\w.]+)", r.path)
        assert r.pkg == m2.group(1) and r.file == m2.group(2)


def test_ppl_content_and_errors(spark, ppl_env):
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | where length(content) = n_chars "
        "| stats count() as c",
        corpus_path=cpath,
    ).toPandas()
    assert got.c.iloc[0] == len(aug)
    with pytest.raises(ValueError, match="content"):
        ppl_query(spark, idx, "source=docs | fields content")
    with pytest.raises(NotImplementedError, match="PPL command"):
        ppl_query(spark, idx, "source=docs | frobnicate x")
    with pytest.raises(ValueError, match="source"):
        ppl_query(spark, idx, "fields lang")


def test_sql_facade(spark, ppl_env):
    """_plugins/_sql facade: Spark SQL over the live doc view —
    grouped aggregation + HAVING + ORDER BY verified against pandas;
    tombstoned docs invisible (shares ppl_base)."""
    from data_prepper_spark.index.ppl import sql_query

    idx, cpath, aug = ppl_env
    got = sql_query(
        spark, idx,
        "SELECT lang, count(*) AS c, max(n_chars) AS mx "
        "FROM docs WHERE n_chars > 100 GROUP BY lang "
        "HAVING count(*) > 5 ORDER BY c DESC, lang",
    ).toPandas()
    m = aug[aug.n_chars > 100]
    want = (
        m.groupby("lang")
        .agg(c=("n_chars", "size"), mx=("n_chars", "max"))
        .reset_index()
        .query("c > 5")
        .sort_values(["c", "lang"], ascending=[False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )
    assert got.lang.tolist() == want.lang.tolist()
    assert got.c.tolist() == want.c.tolist()
    assert got.mx.tolist() == want.mx.tolist()


def test_ppl_span_eventstats_match(spark, ppl_env):
    """span() histogram buckets in stats-by, eventstats window
    aggregates (rows preserved), and index-backed `where match()` —
    all recomputed in pandas (match set from the numpy BM25 oracle's
    matched docs)."""
    import numpy as np

    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | stats count() as c, avg(n_chars) as a "
        "by span(n_chars, 200) | sort span",
    ).toPandas()
    m = aug.copy()
    m["span"] = (m.n_chars // 200 * 200).astype(float)
    want = (
        m.groupby("span")
        .agg(c=("n_chars", "size"), a=("n_chars", "mean"))
        .reset_index()
        .sort_values("span")
    )
    assert got.span.tolist() == want.span.tolist()
    assert got.c.tolist() == want.c.tolist()
    assert got.a.tolist() == pytest.approx(want.a.tolist())

    got = ppl_query(
        spark, idx,
        "source=docs | eventstats avg(n_chars) as lang_avg by lang "
        "| fields path, lang, n_chars, lang_avg",
    ).toPandas()
    assert len(got) == len(aug)  # rows preserved
    la = aug.groupby("lang").n_chars.mean()
    for r in got.itertuples():
        assert r.lang_avg == pytest.approx(la[r.lang])

    # where match(): the inverted index decides membership
    from collections import Counter

    from data_prepper_spark.oracle import bm25_topk, corpus_doc_ids
    from data_prepper_spark.tokenizer import tokenize_series

    dfc: Counter = Counter()
    for tk in tokenize_series(aug.content):
        dfc.update(set(tk))
    term = dfc.most_common(3)[2][0]
    got = ppl_query(
        spark, idx,
        f"source=docs | where match(content, '{term}') "
        "| stats count() as c",
    ).toPandas()
    qdf = pd.DataFrame({"query_id": [0], "query": [term]})
    gold = bm25_topk(aug, qdf, k=len(aug))
    assert got.c.iloc[0] == len(gold)


def test_ppl_lookup(spark, ppl_env, tmp_path):
    """lookup command: LEFT enrich join against a side parquet table
    on the key column; unmatched keys keep null enrichment."""
    idx, cpath, aug = ppl_env
    side = pd.DataFrame({
        "lang": ["python", "java"],
        "family": ["dynamic", "jvm"],
    })
    spath = str(tmp_path / "side.parquet")
    side.to_parquet(spath)
    got = ppl_query(
        spark, idx,
        f"source=docs | lookup '{spath}' lang "
        "| stats count() as c by family",
    ).toPandas()
    fam = dict(zip(side.lang, side.family))
    want = aug.lang.map(fam).value_counts(dropna=False).to_dict()
    got_d = {
        (None if pd.isna(r.family) else r.family): r.c
        for r in got.itertuples()
    }
    want_d = {
        (None if pd.isna(k) else k): v for k, v in want.items()
    }
    assert got_d == want_d


def test_ppl_patterns_fillnull(spark, ppl_env):
    """patterns: simple_pattern log-template (alphanumerics removed,
    punctuation skeleton kept); fillnull both syntaxes."""
    import re as _re

    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | patterns path | "
        "eval gap = if(n_chars > 300, null, n_chars) | "
        "fillnull with -1 in gap | "
        "eval gap2 = if(lang = 'python', null, lang) | "
        "fillnull using gap2 = 'none' | "
        "fields path, patterns_field, gap, gap2, lang, n_chars",
    ).toPandas().sort_values("path").reset_index(drop=True)
    want = aug.sort_values("path").reset_index(drop=True)
    assert got.patterns_field.tolist() == [
        _re.sub(r"[a-zA-Z\d]", "", p) for p in want.path
    ]
    exp_gap = want.n_chars.where(want.n_chars <= 300, -1)
    assert got.gap.tolist() == exp_gap.tolist()
    exp2 = want.lang.where(want.lang != "python", "none")
    assert got.gap2.tolist() == exp2.tolist()
    # custom removal pattern + renamed output column
    got2 = ppl_query(
        spark, idx,
        "source=docs | patterns path new_field=skel pattern='[a-z]' "
        "| fields path, skel",
    ).toPandas().sort_values("path").reset_index(drop=True)
    assert got2.skel.tolist() == [
        _re.sub(r"[a-z]", "", p) for p in want.path
    ]


def test_ppl_trendline(spark, ppl_env):
    """trendline sma/wma vs pandas rolling; leading rows NULL until
    the window fills; order from the preceding sort command."""
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | sort path "
        "| trendline sma(3, n_chars) as t3, wma(3, n_chars) as w3 "
        "| fields path, n_chars, t3, w3",
    ).toPandas().reset_index(drop=True)
    want = aug.sort_values("path").reset_index(drop=True)
    assert got.path.tolist() == want.path.tolist()
    sma = want.n_chars.rolling(3).mean()
    wma = (
        want.n_chars.rolling(3)
        .apply(lambda v: (v * [1, 2, 3]).sum() / 6.0)
    )
    assert got.t3.isna().tolist() == sma.isna().tolist()
    assert got.t3.dropna().tolist() == pytest.approx(
        sma.dropna().tolist()
    )
    assert got.w3.dropna().tolist() == pytest.approx(
        wma.dropna().tolist()
    )
    # trendline's own sort clause (descending), no prior sort command
    got2 = ppl_query(
        spark, idx,
        "source=docs | trendline sort -path sma(2, n_chars) "
        "| fields path, n_chars_trendline",
    ).toPandas()
    want2 = aug.sort_values("path", ascending=False).reset_index(
        drop=True
    )
    m2 = want2.n_chars.rolling(2).mean()
    g2 = got2.set_index("path").n_chars_trendline
    exp = dict(zip(want2.path, m2))
    for p, v in exp.items():
        gv = g2[p]
        if pd.isna(v):
            assert pd.isna(gv)
        else:
            assert gv == pytest.approx(v)
    with pytest.raises(ValueError, match="trendline needs"):
        ppl_query(spark, idx, "source=docs | trendline sma(2, n_chars)")


def test_ppl_expand_flatten(spark, ppl_env):
    """expand: one row per array element (null arrays drop);
    flatten: struct subfields promoted, struct column dropped."""
    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs "
        "| eval st = named_struct('half', n_chars div 2, 'l2', lang) "
        "| flatten st "
        "| eval arr = filter(sequence(1, 3), x -> x <= int(n_chars) % 3) "
        "| expand arr as k "
        "| fields path, half, l2, k",
    ).toPandas()
    assert "st" not in got.columns
    rows = []
    for r in aug.itertuples():
        for k in range(1, int(r.n_chars) % 3 + 1):
            rows.append((r.path, r.n_chars // 2, r.lang, k))
    want = pd.DataFrame(rows, columns=["path", "half", "l2", "k"])
    got = got.sort_values(["path", "k"]).reset_index(drop=True)
    want = want.sort_values(["path", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"half": "int64", "k": "int64"}), want
    )


def test_ppl_kmeans(spark, ppl_env):
    """kmeans: deterministic seeds (k smallest distinct tuples) + N
    Lloyd iterations, replayed in pure numpy; ClusterID appended;
    non-euclidean distance raises; missing fields= raises."""
    import numpy as np

    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | kmeans centroids=3 iterations=2 fields=n_chars "
        "| fields path, n_chars, ClusterID",
    ).toPandas().sort_values("path").reset_index(drop=True)

    x = aug.sort_values("path").n_chars.to_numpy(dtype=float)
    seeds = np.sort(np.unique(x))[:3]
    cents = seeds.copy()
    for _ in range(2):
        d = np.abs(x[:, None] - cents[None, :])
        a = d.argmin(axis=1)  # argmin ties -> lowest index
        for j in range(3):
            if (a == j).any():
                cents[j] = x[a == j].mean()
    d = np.abs(x[:, None] - cents[None, :])
    want = d.argmin(axis=1)
    assert got.ClusterID.to_numpy().tolist() == want.tolist()
    assert got.ClusterID.nunique() > 1
    with pytest.raises(NotImplementedError, match="distance_type"):
        ppl_query(
            spark, idx,
            "source=docs | kmeans centroids=2 fields=n_chars "
            "distance_type='COSINE'",
        )
    with pytest.raises(ValueError, match="fields="):
        ppl_query(spark, idx, "source=docs | kmeans centroids=2")


def test_ppl_ad(spark, ppl_env):
    """ad: routes through operators/anomaly.anomaly_detector —
    per-category trailing z-grade replayed in pandas (verbose=true
    keeps every anomalous row)."""
    import numpy as np

    idx, cpath, aug = ppl_env
    got = ppl_query(
        spark, idx,
        "source=docs | ad field=n_chars category_field=lang "
        "time_field=path sample_size=8 output_after=2 threshold=1.0 "
        "verbose=true | fields path, lang, grade",
    ).toPandas().sort_values("path").reset_index(drop=True)

    rows = []
    for lang, g in aug.sort_values("path").groupby("lang"):
        v = g.n_chars.to_numpy(dtype=float)
        for i in range(len(v)):
            lo = max(0, i - 8)
            win = v[lo:i]
            if len(win) < 2:
                continue
            sd = win.std(ddof=1)
            if not sd > 0:
                continue
            z = abs(v[i] - win.mean()) / sd
            grade = min(1.0, max(0.0, z / 1.0 - 1.0))
            if grade > 0 and i + 1 > 2:
                rows.append((g.path.iloc[i], lang, grade))
    import pandas as pd

    want = pd.DataFrame(rows, columns=["path", "lang", "grade"])
    want = want.sort_values("path").reset_index(drop=True)
    assert got.path.tolist() == want.path.tolist() and len(got) > 0
    assert got.grade.tolist() == pytest.approx(want.grade.tolist())
    with pytest.raises(ValueError, match="time_field"):
        ppl_query(spark, idx, "source=docs | ad field=n_chars")


def test_ppl_describe(spark, ppl_env):
    """describe: schema rows of the doc view; piped where/sort/head
    compose on the metadata table."""
    idx, cpath, aug = ppl_env
    got = ppl_query(spark, idx, "describe docs").toPandas()
    cols = dict(zip(got.column_name, got.data_type))
    assert {"doc_id", "repo", "path", "commit"} <= set(cols)
    assert cols.get("lang") == "string"
    assert cols.get("n_chars") == "bigint"
    filtered = ppl_query(
        spark, idx,
        "describe docs | where data_type = 'string' "
        "| sort column_name | head 2",
    ).toPandas()
    want = sorted(k for k, v in cols.items() if v == "string")[:2]
    assert filtered.column_name.tolist() == want


def test_ppl_join(spark, ppl_env, tmp_path):
    """join command: typed equi-joins against a parquet right side —
    inner narrows, left keeps, semi/anti filter without widening."""
    idx, cpath, aug = ppl_env
    side = pd.DataFrame({
        "lang": ["python", "java"],
        "family": ["dynamic", "jvm"],
    })
    spath = str(tmp_path / "jside.parquet")
    side.to_parquet(spath)
    base = f"source=docs | join TYPE on lang '{spath}' "
    inner = ppl_query(
        spark, idx, base.replace("TYPE", "type=inner")
        + "| stats count() as c",
    ).toPandas().c.iloc[0]
    want_inner = int(aug.lang.isin(side.lang).sum())
    assert inner == want_inner
    left = ppl_query(
        spark, idx, base.replace("TYPE", "type=left")
        + "| stats count() as c, count(family) as cf",
    ).toPandas()
    assert left.c.iloc[0] == len(aug)
    assert left.cf.iloc[0] == want_inner
    semi = ppl_query(
        spark, idx, base.replace("TYPE", "type=semi")
        + "| stats count() as c",
    ).toPandas()
    assert semi.c.iloc[0] == want_inner
    anti = ppl_query(
        spark, idx, base.replace("TYPE", "type=anti")
        + "| stats count() as c",
    ).toPandas()
    assert anti.c.iloc[0] == len(aug) - want_inner
    # semi/anti never widen
    cols = ppl_query(
        spark, idx, base.replace("TYPE", "type=semi") + "| head 1",
    ).columns
    assert "family" not in cols
    with pytest.raises(ValueError, match="join type"):
        ppl_query(spark, idx, base.replace("TYPE", "type=cross"))
