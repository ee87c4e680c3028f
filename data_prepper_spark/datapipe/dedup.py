"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale shapes (the part that must survive 1000 executors):
* exact        — one groupBy on a 64-bit content hash (map-side combine).
* minhash LSH  — per-doc signature (vectorized numpy, one pass),
  explode to (band, band_hash) keys, groupBy bucket -> candidate pairs
  only within buckets (never all-pairs), exact-verify candidates.
* simhash      — 64-bit fingerprint; near-dup = hamming distance <= k,
  found by banding the fingerprint into 4 x 16-bit keys (pigeonhole:
  any pair within hamming 3 shares at least one exact 16-bit band).
* ngram jaccard — exact set Jaccard via explode + equi-join on shared
  shingles (|A∩B| from the join, |A∪B| = |A|+|B|-|A∩B|), candidate-
  bounded by a df cap on shingles (stop-shingle removal kills the
  quadratic hot-shingle blowup the same way hot-term salting does).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import tokenize_col

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one canonical row (lowest id) per exact content hash."""
    df = df.withColumn(
        "_min_id", F.min(id_col).over(Window.partitionBy(F.xxhash64(F.col(text_col))))
    )
    return df.filter(F.col(id_col) == F.col("_min_id")).drop("_min_id")


def _hash_tokens(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes for an object array of strings
    (pandas' C siphash with a fixed key — stable across processes)."""
    return pd.util.hash_array(arr, hash_key="0123456789123456").astype(np.uint64)


def _shingle_hashes(texts: pd.Series, shingle: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc token-shingle hash sets. Returns (hashes, doc lengths).

    Shingles are hashed incrementally from token hashes (mix-combine of
    `shingle` consecutive token hashes) — vectorized, no string concat.
    Tokenization runs on the Arrow path (token-identical to
    tokenize_series; see tokenizer.py).
    """
    import pyarrow as pa

    from ..tokenizer import tokenize_flat_arrow

    arr = pa.Array.from_pandas(texts.fillna(""))
    flat_pa, _, lens = tokenize_flat_arrow(arr)
    th = _hash_tokens(flat_pa.to_numpy(zero_copy_only=False))
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n_sh = np.maximum(lens - shingle + 1, 0)
    # rolling combine: h[i] = mix(th[i] .. th[i+shingle-1])
    out = np.zeros(int(n_sh.sum()), dtype=np.uint64)
    pos = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    idx = np.arange(int(n_sh.sum()), dtype=np.int64)
    base = np.repeat(starts, n_sh) + (idx - np.repeat(pos, n_sh))
    for j in range(shingle):
        out = out * np.uint64(0x100000001B3) ^ th[base + j]
    return out, n_sh


def minhash_signatures_udf(num_perm: int, shingle: int, text_col: str, id_col: str):
    """mapInPandas fn: (id, text) -> (id, sig array<long>)."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def fn(it):
        for pdf in it:
            sh, n_sh = _shingle_hashes(pdf[text_col], shingle)
            ids = pdf[id_col].to_numpy(np.int64)
            sigs = np.full((len(pdf), num_perm), np.iinfo(np.uint64).max, np.uint64)
            if len(sh):
                seg = np.repeat(np.arange(len(pdf)), n_sh)
                x = (sh % _MERSENNE).astype(np.uint64)
                for p in range(num_perm):
                    hp = (a[p] * x + b[p]) % np.uint64(_MERSENNE)
                    np.minimum.at(sigs[:, p], seg, hp)
            keep = n_sh > 0
            yield pd.DataFrame(
                {
                    id_col: ids[keep],
                    "sig": [row.astype(np.int64).tolist() for row in sigs[keep]],
                }
            )

    return fn


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
    threshold: float = 0.5,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding, with
    signature-estimated Jaccard >= threshold. Returns (id_a, id_b, jaccard).

    `max_bucket` drops band buckets holding more than that many docs —
    the hot-key guard for boilerplate clusters (m identical files
    produce m^2 candidate pairs per band; a cluster bigger than the cap
    almost surely collides in several bands, so pair recall within it
    degrades gracefully rather than quadratically exploding the join).
    """
    rows = num_perm // bands
    sig = df.select(id_col, text_col).mapInPandas(
        minhash_signatures_udf(num_perm, shingle, text_col, id_col),
        schema=f"{id_col} long, sig array<long>",
    )
    sig = sig.cache()
    band_cols = [
        F.xxhash64(
            F.lit(bnd), F.slice("sig", bnd * rows + 1, rows).cast("string")
        ).alias(f"b{bnd}")
        for bnd in range(bands)
    ]
    buckets = sig.select(
        id_col,
        F.explode(F.array(*band_cols)).alias("band_hash"),
    )
    if max_bucket is not None:
        hot = (
            buckets.groupBy("band_hash")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band_hash")
        )
        buckets = buckets.join(F.broadcast(hot), "band_hash", "left_anti")
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), "band_hash")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    est = (
        cand.join(sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn(
            "jaccard",
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)),"
                " 0, (acc, v) -> acc + v) / size(sig_a)"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return est


def minhash_lsh_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """MinHash + LSH with the DuckDB-portable hash family
    h_p(s) = phash60(p || ':' || s): pure Catalyst, oracle-provable.

    Same shape as minhash_lsh_pairs (signature -> banded bucket join ->
    estimate on candidates, never all-pairs); the per-permutation hash
    is md5-derived so a DuckDB oracle reproduces it bit-for-bit. Used
    by the driver entry; the numpy/siphash fast path stays the
    production default. `max_bucket` (default ON) drops band buckets
    larger than the cap — the boilerplate-cluster skew guard; the SQL
    oracle mirrors it exactly."""
    from .phash import phash60

    rows = num_perm // bands
    toks = tokenize_col(F.col(text_col))
    # docs shorter than `shingle` tokens yield NO shingles (sequence()
    # auto-reverses through 0 and slice() then throws, so guard first;
    # matches the oracle's len(toks) >= shingle filter)
    shingles = F.when(
        F.size(toks) >= shingle,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (shingle - 1)),
                lambda i: F.array_join(F.slice(toks, i, shingle), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("shs"),
                lambda s: phash60(F.concat(F.lit(f"{p}:"), s)),
            )
        )
        for p in range(num_perm)
    ]
    sig = (
        df.select(F.col(id_col).alias("id"), shingles.alias("shs"))
        .filter(F.size(F.col("shs")) >= 1)
        .select("id", F.array(*sig_cols).alias("sig"))
    )
    sig = sig.cache()
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.concat_ws(
                            ",", F.slice("sig", bnd * rows + 1, rows)
                        ).alias("key"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    if max_bucket is not None:
        hot = (
            banded.groupBy("band", "key")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "key")
        )
        banded = banded.join(F.broadcast(hot), ["band", "key"], "left_anti")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    est = (
        cand.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn(
            "jaccard",
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)),"
                " 0, (acc, v) -> acc + v)"
            )
            / F.lit(float(num_perm)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return est


def minhash_lsh_pairs_portable_sql(
    toks_expr: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 1000,
) -> str:
    """DuckDB oracle mirroring minhash_lsh_pairs_portable over
    `documents` (doc_id/text)."""
    from .phash import phash60_sql

    rows = num_perm // bands
    sh = (
        f"list_distinct(list_transform(range(1, len(toks) - {shingle} + 2), "
        f"i -> array_to_string(list_slice(toks, i, i + {shingle - 1}), ' ')))"
    )
    sig_elems = ", ".join(
        f"list_min(list_transform(shs, s -> {phash60_sql(repr(str(p) + ':') + ' || s')}))"
        for p in range(num_perm)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, sig, {bnd} AS band, "
        f"array_to_string(list_slice(sig, {bnd * rows + 1}, {bnd * rows + rows}), ',') AS key "
        "FROM sig"
        for bnd in range(bands)
    )
    cap = (
        f"""banded AS (
  SELECT b.* FROM banded_all b
  JOIN (SELECT band, key FROM banded_all
        GROUP BY band, key HAVING COUNT(*) <= {max_bucket}) ok
  ON b.band = ok.band AND b.key = ok.key
),"""
        if max_bucket is not None
        else "banded AS (SELECT * FROM banded_all),"
    )
    return f"""
WITH base AS (SELECT doc_id AS id, {toks_expr} AS toks FROM documents),
sh AS (
  SELECT id, {sh} AS shs FROM base WHERE len(toks) >= {shingle}
),
sig AS (SELECT id, [{sig_elems}] AS sig FROM sh),
banded_all AS ({band_rows}),
{cap}
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key
  WHERE l.id < r.id
),
est AS (
  SELECT id_a, id_b,
         list_sum(list_transform(range(1, {num_perm} + 1),
                  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
           / {float(num_perm)} AS jaccard
  FROM cand
  JOIN sig a ON a.id = id_a
  JOIN sig b ON b.id = id_b
)
SELECT id_a, id_b, jaccard FROM est WHERE jaccard >= {threshold}
"""


def simhash_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    nbits: int = 60,
    bands: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """60-bit SimHash with the portable hash — pure Catalyst twin of
    simhash_pairs (tf-weighted bit votes, pigeonhole banding, exact
    hamming verify), oracle-provable in DuckDB."""
    from .phash import phash60

    band_bits = nbits // bands
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize_col(F.col(text_col))).alias("t"),
    ).withColumn("h", phash60(F.col("t")))
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(nbits)
    ]
    g = tok.groupBy("id").agg(*votes)
    fp_expr = None
    for b in range(nbits):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp_expr = bit if fp_expr is None else fp_expr + bit
    fp = g.select("id", fp_expr.cast("long").alias("simhash")).cache()
    mask = (1 << band_bits) - 1
    bands_df = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.key")
    if max_bucket is not None:
        hot = (
            bands_df.groupBy("band", "key")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "key")
        )
        bands_df = bands_df.join(F.broadcast(hot), ["band", "key"], "left_anti")
    return (
        bands_df.alias("l")
        .join(bands_df.alias("r"), ["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("h_a"),
            F.col("r.simhash").alias("h_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_portable_sql(
    toks_expr: str,
    max_hamming: int = 8,
    nbits: int = 60,
    bands: int = 4,
    max_bucket: int | None = 1000,
) -> str:
    """DuckDB oracle mirroring simhash_pairs_portable over `documents`."""
    from .phash import phash60_sql

    band_bits = nbits // bands
    mask = (1 << band_bits) - 1
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(nbits)
    )
    fp = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(nbits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, simhash, {i} AS band, (simhash >> {i * band_bits}) & {mask} AS key FROM fp"
        for i in range(bands)
    )
    cap = (
        f"""banded AS (
  SELECT b.* FROM banded_all b
  JOIN (SELECT band, key FROM banded_all
        GROUP BY band, key HAVING COUNT(*) <= {max_bucket}) ok
  ON b.band = ok.band AND b.key = ok.key
),"""
        if max_bucket is not None
        else "banded AS (SELECT * FROM banded_all),"
    )
    return f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({toks_expr}) AS t FROM documents
),
h AS (SELECT id, {phash60_sql('t')} AS h FROM tok),
votes AS (SELECT id, {votes} FROM h GROUP BY id),
fp AS (SELECT id, CAST({fp} AS BIGINT) AS simhash FROM votes),
banded_all AS ({band_rows}),
{cap}
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b,
         l.simhash AS h_a, r.simhash AS h_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key
  WHERE l.id < r.id
)
SELECT id_a, id_b, bit_count(xor(h_a, h_b)) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= {max_hamming}
"""


def simhash_udf(text_col: str, id_col: str):
    """mapInPandas fn: 64-bit SimHash of token multiset (tf-weighted)."""

    def fn(it):
        import pyarrow as pa

        from ..tokenizer import tokenize_flat_arrow

        for pdf in it:
            arr = pa.Array.from_pandas(pdf[text_col].fillna(""))
            flat_pa, _, lens = tokenize_flat_arrow(arr)
            th = _hash_tokens(flat_pa.to_numpy(zero_copy_only=False))
            seg = np.repeat(np.arange(len(pdf)), lens)
            acc = np.zeros((len(pdf), 64), dtype=np.int64)
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            ) * 2 - 1
            np.add.at(acc, seg, bits)
            fp = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64),
                    "simhash": fp.sum(axis=1).view(np.int64),
                }
            )

    return fn


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4-band
    pigeonhole blocking (exact within candidates). `max_bucket` is the
    hot-bucket skew guard (see minhash_lsh_pairs)."""
    fp = df.select(id_col, text_col).mapInPandas(
        simhash_udf(text_col, id_col), schema=f"{id_col} long, simhash long"
    )
    fp = fp.cache()
    bands = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    if max_bucket is not None:
        hot = (
            bands.groupBy("band", "key")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "key")
        )
        bands = bands.join(F.broadcast(hot), ["band", "key"], "left_anti")
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("h_a"),
            F.col("r.simhash").alias("h_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return cand.select("id_a", "id_b", "hamming")


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    nbits: int = 8,
    bands: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold).

    Default path (nbits>0): OR-amplified random-hyperplane LSH — `bands`
    independent signatures of `nbits` sign bits each; candidate pairs
    share at least one exact band key (equi-join per band, never
    all-pairs), then exact cosine verifies every candidate. Miss
    probability per qualifying pair is (1 - p^nbits)^bands with
    p = 1 - acos(threshold)/pi, so recall is tuned by (nbits, bands):
    the defaults give ~1e-4 at threshold 0.95; looser thresholds need
    shorter bands and more of them (the driver entry uses nbits=2,
    bands=40 at threshold 0.35 -> miss ~6e-9 per pair).

    nbits=0: exact all-pairs self-join — O(n^2), test/oracle mode only.
    """
    from .similarity import _bucket_col, _dot, _norm, hyperplanes

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if nbits > 0:
        dim = len(df.select(vec_col).first()[0])
        planes = hyperplanes(dim, nbits * bands)
        keys = F.array(
            *[
                _bucket_col("v", planes[b * nbits : (b + 1) * nbits])
                for b in range(bands)
            ]
        )
        # band on IDS ONLY: the banded explode is `bands` rows per
        # vector, so carrying the vector payload through it (and the
        # candidate dedup) would multiply shuffle bytes by the band
        # count; instead candidates travel as id pairs and the vectors
        # join back once each for the exact verify
        banded = v.select(
            "id", F.posexplode(keys).alias("band", "key")
        )
        cand = (
            banded.alias("l")
            .join(banded.alias("r"), ["band", "key"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
        pairs = (
            cand.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
            .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    _dot(F.col("va"), F.col("vb"))
                    / (_norm(F.col("va")) * _norm(F.col("vb")))
                ).alias("cosine"),
            )
        )
        return pairs.filter(F.col("cosine") >= threshold).select(
            "id_a", "id_b", "cosine"
        )
    joined = v.alias("l").crossJoin(v.alias("r"))
    pairs = (
        joined.filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            (
                _dot(F.col("l.v"), F.col("r.v"))
                / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.select("id_a", "id_b", "cosine").distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """EXACT n-gram-set Jaccard >= threshold, all in native Spark:
    explode distinct shingles, drop hot shingles (df > max_shingle_df —
    the skew guard), equi-join on shingle -> intersection counts."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.transform(
                            F.sequence(
                                F.lit(0),
                                F.size(tokenize_col(F.col(text_col))) - n,
                            ),
                            lambda i: F.slice(
                                tokenize_col(F.col(text_col)), i + 1, n
                            ),
                        ),
                        lambda s: F.size(s) == n,
                    ),
                    lambda s: F.array_join(s, " "),
                )
            )
        ).alias("shingle"),
    )
    sh = sh.cache()
    hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
    sh2 = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh2.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh2.alias("l")
        .join(sh2.alias("r"), "shingle")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_clusters(
    pairs: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the
    'keep one per cluster' completion of the dedup family: every
    node gets cluster = min id reachable through dup edges, and the
    min member is flagged canonical (the survivor a training-data
    pipeline keeps).

    Min-label propagation: each round every node takes the min label
    among itself and its neighbors; converges in <= graph-diameter
    rounds (near-dup clusters are shallow: boilerplate groups are
    near-cliques). Each round is ONE edge-list join + ONE groupBy —
    never an all-pairs product — and the frame is localCheckpoint-ed
    per round so lineage (and the plan Catalyst must optimize) stays
    flat at 100-TB edge counts. Deterministic for any input.

    Returns (id, cluster, is_canonical)."""
    e = pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
    edges = e.unionByName(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).distinct()
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("id", "y"), "y"
        ).select(F.col("x").alias("id"), "lbl")
        new = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        prev, labels = labels, new.select("id", "lbl")
        # convergence check (a driver count()) every SECOND round:
        # propagation is monotone, so the worst case is one extra
        # cheap round, and half the driver round-trips disappear
        # (ADVICE r03 minor)
        if it % 2 == 0:
            continue
        changed = (
            labels.withColumnRenamed("lbl", "nl")
            .join(prev, "id")
            .filter(F.col("nl") != F.col("lbl"))
            .count()
        )
        if changed == 0:
            break
    return labels.select(
        "id",
        F.col("lbl").alias("cluster"),
        (F.col("id") == F.col("lbl")).alias("is_canonical"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n\n",
    min_count: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level repeated-passage removal (the RefinedWeb /
    C4-style boilerplate scrub): any paragraph whose EXACT text
    appears in >= `min_count` documents is dropped from every doc.

    Returns (id, text, n_paragraphs, n_removed) with `text` rebuilt
    from the surviving paragraphs in original order.

    Plan shape: paragraph explode -> one hash aggregation on the
    64-bit paragraph fingerprint (df-style count of DISTINCT docs, so
    a passage repeated only inside one doc survives) -> broadcast-able
    dup set joined back -> per-doc ordered rebuild. The only wide
    exchange is the fingerprint count; the dup set is tiny relative
    to the corpus (boilerplate cardinality), so the join back
    broadcasts. No Python in the loop.
    """
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("fp", F.xxhash64(F.col("para")))
    dup = (
        paras.where(F.length("para") >= min_chars)
        .groupBy("fp")
        .agg(F.count_distinct("id").alias("ndocs"))
        .where(F.col("ndocs") >= min_count)
        .select("fp")
    )
    # no forced broadcast: the dup set is usually tiny (boilerplate
    # cardinality) and AQE will broadcast it then, but a pathological
    # corpus where most paragraphs repeat must not OOM an executor
    kept = paras.join(dup.withColumn("__dup", F.lit(True)), "fp", "left")
    return (
        kept.groupBy("id")
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum(
                F.when(F.col("__dup"), F.lit(1)).otherwise(F.lit(0))
            ).cast("int").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__dup").isNull(),
                                F.struct("pos", "para"),
                            )
                        )
                    ),
                    lambda x: x["para"],
                ),
                sep,
            ).alias("text"),
        )
        .select("id", "text", "n_paragraphs", "n_removed")
    )


def canonical_keep(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Quality-aware survivor selection — the step after clustering
    in a production dedup pipeline: instead of keeping the min-id
    member, keep the BEST member of each near-dup cluster by a
    quality column (length, quality_score, ngram_logprob, ...),
    ties -> lowest id so reruns are stable. One join + one window
    ranked inside cluster frames (cluster sizes are near-dup group
    sizes — bounded, never corpus-scale partitions). Rows keep their
    cluster and a `keep` flag; nothing is dropped (callers filter —
    the audit-trail shape)."""
    j = clusters.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return j.withColumn("keep", F.row_number().over(w) == 1)
