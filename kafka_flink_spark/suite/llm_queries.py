"""LLM-data-pipeline queries (dedup, similarity, text analysis) over
the documents/embeddings fixtures. Populated by operators/dedup.py,
operators/similarity.py, operators/text.py."""
