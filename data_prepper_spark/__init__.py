"""data_prepper_spark — a PySpark-native analytics engine with the
capabilities of opensearch-project/data-prepper, recast as a DataFrame job.

The flagship pipeline (BASELINE.json north_rule) is an inverted-index
build + BM25 top-k query engine over a source-code corpus table
(repo, path, commit, lang, content):

  scan -> sha256 validate (quarantine = DLQ analog) -> vectorized
  tokenize (pandas/Arrow UDF) -> per-(term, doc-range-bucket) posting
  blocks (delta+varbyte, block-max metadata) -> partitioned index
  tables -> BM25 top-k query executor with block-max pruning.

The generic operator layer (operators/) re-expresses Data Prepper's
processor plugins (SURVEY.md section 2.4-2.7) as native DataFrame
transforms; datapipe/ adds large-scale training-data-pipeline ops
(dedup, similarity search, text stats, multimodal plumbing).
"""

__version__ = "0.1.0"
