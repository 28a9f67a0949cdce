"""Large-scale training-data pipeline operators (beyond the reference's
own inventory): deduplication, similarity search, text analysis, and
multimodal-column plumbing — each designed for 100 TB inputs and tested
against the driver's documents/embeddings tables.
"""
