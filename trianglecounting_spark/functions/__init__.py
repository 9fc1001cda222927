"""Training-data pipeline functions: text analysis, dedup, similarity, multimodal."""
