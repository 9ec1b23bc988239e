"""Training-data pipeline operators (dedup, similarity, text) — placeholder.

Filled in after the energy-core catalog is green.
"""
