"""LLM-data-pipeline queries (dedup, similarity, text analysis).

Filled in as the operators land; see operators/dedup.py,
operators/similarity.py, operators/textstats.py.
"""
