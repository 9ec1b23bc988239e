from .catalog import CatalogQuery, all_queries, register  # noqa: F401
