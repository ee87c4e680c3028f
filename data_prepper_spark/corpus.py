"""Deterministic synthetic code-corpus generator (FIXTURES.md §1-2).

Seed=42, no wall-clock, chunked so doc i's content is identical across
scale factors and parallelism levels (chunk RNG = PCG64([42, chunk])).
Content exercises the tokenizer (camelCase / snake_case / raw stems),
language keywords, and the hot-term skew path (5 hot terms in ~60% of
docs, which makes the unsalted term merge skew-bound — SURVEY.md §2.8).

Generated lazily and cached under fixtures/ (gitignored); ~1k docs at
SF=0.001, ~10k at SF=0.01, ~100k at SF=0.1.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
CHUNK_DOCS = 512
HOT_TERMS = ["init", "get", "set", "main", "util"]
N_QUERIES = 200

# lang -> (weight out of 100, keywords, extension)
LANGS: dict[str, tuple[int, list[str], str]] = {
    "python": (25, ["def", "class", "import", "return", "lambda", "yield"], "py"),
    "java": (20, ["public", "static", "void", "extends", "interface", "final"], "java"),
    "go": (12, ["func", "package", "chan", "defer", "goroutine", "struct"], "go"),
    "js": (12, ["function", "const", "async", "await", "export", "prototype"], "js"),
    "rust": (10, ["impl", "trait", "enum", "match", "unsafe", "crate"], "rs"),
    "c": (8, ["typedef", "sizeof", "volatile", "extern", "union", "register"], "c"),
    "scala": (8, ["object", "trait", "implicit", "sealed", "case", "val"], "scala"),
    "sql": (5, ["select", "where", "group", "join", "having", "union"], "sql"),
}

_SYL = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na",
    "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu", "ze",
    "bra", "cro", "dri", "fle", "gri", "ple", "sta", "tre", "quo", "sna",
    "blo", "cla", "dro", "fri", "gla", "pro", "ski", "slo", "tra", "vri",
]

_SEP_CYCLE = [" ", "(); ", " = ", ". ", ", ", " { ", " } ", "; "]


def _lang_buckets() -> list[str]:
    out: list[str] = []
    for lang, (w, _, _) in LANGS.items():
        out.extend([lang] * w)
    assert len(out) == 100
    return out


_LANG_BY_BUCKET = _lang_buckets()

_stems_cache: np.ndarray | None = None
_zipf_cdf_cache: np.ndarray | None = None


def stems() -> np.ndarray:
    global _stems_cache
    if _stems_cache is None:
        n = len(_SYL)
        out = [
            _SYL[i % n] + _SYL[(i // n) % n] + _SYL[(i // (n * n)) % n]
            for i in range(VOCAB_SIZE)
        ]
        _stems_cache = np.array(out, dtype=object)
    return _stems_cache


def _zipf_cdf() -> np.ndarray:
    global _zipf_cdf_cache
    if _zipf_cdf_cache is None:
        p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
        _zipf_cdf_cache = np.cumsum(p / p.sum())
    return _zipf_cdf_cache


def _sample_zipf(rng: np.random.Generator, size: int) -> np.ndarray:
    return np.searchsorted(_zipf_cdf(), rng.random(size)).astype(np.int64)


def _doc_hash(i: np.ndarray) -> np.ndarray:
    """Cheap deterministic per-doc hash (splitmix-ish), vectorized."""
    x = (i.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
        0xBF58476D1CE4E5B9
    )
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def gen_chunk(chunk_idx: int, n_docs_total: int) -> pd.DataFrame:
    """Generate docs [chunk_idx*CHUNK_DOCS, ...) capped at n_docs_total."""
    start = chunk_idx * CHUNK_DOCS
    end = min(start + CHUNK_DOCS, n_docs_total)
    idx = np.arange(start, end, dtype=np.int64)
    nd = len(idx)
    rng = np.random.default_rng([42, chunk_idx])
    h = _doc_hash(idx)

    n_lines = 20 + (h % np.uint64(381)).astype(np.int64)
    n_toks = n_lines * 12
    total = int(n_toks.sum())
    doc_of_tok = np.repeat(np.arange(nd), n_toks)
    starts = np.concatenate([[0], np.cumsum(n_toks)[:-1]])
    pos_in_doc = np.arange(total) - np.repeat(starts, n_toks)

    st = stems()
    cap = _cap_stems()
    a = _sample_zipf(rng, total)
    b = _sample_zipf(rng, total)
    form = rng.random(total)

    tok = st[a].copy()
    camel = form >= 0.5
    snake = form >= 0.75
    camel &= ~snake
    tok[camel] = st[a[camel]] + cap[b[camel]]
    tok[snake] = st[a[snake]] + "_" + st[b[snake]]

    # language keywords every 8th token
    langs = np.array(
        [_LANG_BY_BUCKET[int(i % 100)] for i in idx], dtype=object
    )
    kw_mask = pos_in_doc % 8 == 7
    kw_lists = {lang: np.array(LANGS[lang][1], dtype=object) for lang in LANGS}
    for lang in LANGS:
        m = kw_mask & (langs[doc_of_tok] == lang)
        if m.any():
            tok[m] = kw_lists[lang][pos_in_doc[m] // 8 % len(kw_lists[lang])]

    # hot terms: ~60% of docs, every 20th token
    hot_doc = (idx % 10 < 6)[doc_of_tok]
    hot_mask = hot_doc & (pos_in_doc % 20 == 5)
    hot_arr = np.array(HOT_TERMS, dtype=object)
    tok[hot_mask] = hot_arr[(pos_in_doc[hot_mask] // 20) % len(HOT_TERMS)]

    # separators: punctuation cycle, newline every 12 tokens
    sep_arr = np.array(_SEP_CYCLE, dtype=object)
    seps = sep_arr[(np.arange(total)) % len(sep_arr)].copy()
    seps[pos_in_doc % 12 == 11] = "\n"
    pieces = np.char.add(tok.astype(str), seps.astype(str))

    contents = []
    for d in range(nd):
        s0, s1 = starts[d], starts[d] + n_toks[d]
        contents.append("".join(pieces[s0:s1]))

    word = st[(h % np.uint64(VOCAB_SIZE)).astype(np.int64)]
    dirw = st[((h >> np.uint64(20)) % np.uint64(VOCAB_SIZE)).astype(np.int64)]
    exts = {lang: LANGS[lang][2] for lang in LANGS}
    rows = {
        "repo": [f"org{int(i) % 97}/repo{int(i) % 389}" for i in idx],
        "path": [
            f"src/{dirw[k]}/{word[k]}.{exts[langs[k]]}" for k in range(nd)
        ],
        "commit": [
            hashlib.sha1(f"commit-{int(i)}".encode()).hexdigest() for i in idx
        ],
        "lang": list(langs),
        "content": contents,
        "content_sha256": [
            hashlib.sha256(c.encode()).hexdigest() for c in contents
        ],
    }
    return pd.DataFrame(rows)


_cap_cache: np.ndarray | None = None


def _cap_stems() -> np.ndarray:
    global _cap_cache
    if _cap_cache is None:
        _cap_cache = np.array([s.capitalize() for s in stems()], dtype=object)
    return _cap_cache


def n_docs_for_sf(sf: float) -> int:
    return max(int(sf * 1_000_000), 100)


CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("content_sha256", pa.string()),
    ]
)


CHUNKS_PER_FILE = 16  # file = the resumable work unit (reference
# iceberg-source leader plans one task per data file, TaskGrouper.java:27-30)


def _gen_chunk_star(args: tuple[int, int]) -> pd.DataFrame:
    return gen_chunk(*args)


def write_corpus(sf: float, out_dir: str, chunks_per_file: int = CHUNKS_PER_FILE) -> int:
    """Write the corpus as a directory of part files (multi-file layout:
    each file is one lease/work unit for the resumable build). Chunks
    are generated in parallel (fork pool) — per-chunk RNG keys make the
    output byte-identical to sequential generation."""
    import multiprocessing as mp

    n = n_docs_for_sf(sf)
    n_chunks = (n + CHUNK_DOCS - 1) // CHUNK_DOCS
    os.makedirs(out_dir, exist_ok=True)
    # warm module caches before fork so workers share them
    stems(), _zipf_cdf(), _cap_stems()
    w = None
    fidx = 0

    def _write(c: int, pdf: pd.DataFrame):
        nonlocal w, fidx
        if c % chunks_per_file == 0:
            if w is not None:
                w.close()
            w = pq.ParquetWriter(
                os.path.join(out_dir, f"part-{fidx:05d}.parquet"),
                CORPUS_SCHEMA,
                compression="snappy",
            )
            fidx += 1
        w.write_table(pa.Table.from_pandas(pdf, schema=CORPUS_SCHEMA))

    nproc = min(16, os.cpu_count() or 4, n_chunks)
    if nproc > 1 and n_chunks > 2:
        with mp.get_context("fork").Pool(nproc) as pool:
            for c, pdf in enumerate(
                pool.imap(_gen_chunk_star, [(c, n) for c in range(n_chunks)])
            ):
                _write(c, pdf)
    else:
        for c in range(n_chunks):
            _write(c, gen_chunk(c, n))
    if w is not None:
        w.close()
    return n


def gen_queries() -> pd.DataFrame:
    """~200 deterministic queries (FIXTURES.md §2)."""
    rng = np.random.default_rng([42, 999_983])
    st = stems()
    kws = [kw for lang in LANGS for kw in LANGS[lang][1]]
    rows = []
    for qid in range(N_QUERIES):
        kind = qid % 6
        if kind == 0:  # single rare term
            q = st[int(rng.integers(10_000, VOCAB_SIZE))]
        elif kind == 1:  # single hot term
            q = HOT_TERMS[qid // 6 % len(HOT_TERMS)]
        elif kind == 2:  # camelCase compound, matches only after splitting
            x, y = _sample_zipf(rng, 2)
            q = st[x] + str(st[y]).capitalize()
        elif kind == 3:  # language keyword
            q = kws[qid // 6 % len(kws)]
        else:  # multi-term conjunction (2-4 terms)
            k = 2 + (qid % 3)
            ids = _sample_zipf(rng, k)
            q = " ".join(st[i] for i in ids)
        rows.append((qid, q))
    return pd.DataFrame(rows, columns=["query_id", "query"]).astype(
        {"query_id": "int64"}
    )


def ensure_fixtures(sf: float, base_dir: str = "/root/repo/fixtures") -> str:
    """Generate (once) and return the fixture dir for scale factor sf."""
    d = os.path.join(base_dir, f"sf{sf}")
    corpus = os.path.join(d, "corpus.parquet")
    queries = os.path.join(d, "queries.parquet")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(corpus):
        tmp = corpus + ".tmp"
        write_corpus(sf, tmp)
        os.rename(tmp, corpus)
    if not os.path.exists(queries):
        tmp = queries + ".tmp"
        gen_queries().to_parquet(tmp, index=False)
        os.rename(tmp, queries)
    return d


def write_corrupt_corpus(sf: float, out_dir: str) -> None:
    """Corpus variant with ~1% sha mismatches and ~0.5% null content
    (FIXTURES.md §4 `corrupt_corpus`) — must land in quarantine."""
    n = n_docs_for_sf(sf)
    n_chunks = (n + CHUNK_DOCS - 1) // CHUNK_DOCS
    os.makedirs(out_dir, exist_ok=True)
    with pq.ParquetWriter(
        os.path.join(out_dir, "part-00000.parquet"),
        CORPUS_SCHEMA,
        compression="snappy",
    ) as w:
        for c in range(n_chunks):
            pdf = gen_chunk(c, n)
            i0 = c * CHUNK_DOCS
            gidx = np.arange(i0, i0 + len(pdf))
            bad_sha = gidx % 100 == 13
            bad_content = (gidx % 200 == 57) & ~bad_sha
            pdf.loc[bad_sha, "content_sha256"] = "deadbeef" * 8
            pdf.loc[bad_content, "content"] = None
            w.write_table(pa.Table.from_pandas(pdf, schema=CORPUS_SCHEMA))
