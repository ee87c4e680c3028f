"""Large-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal column plumbing.

These extend the reference's operator surface with the operations a
100 TB pretraining-data pipeline needs; all are designed shuffle-first
(bounded candidate generation, broadcast small sides, no driver loops).
"""
