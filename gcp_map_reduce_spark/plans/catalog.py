"""Catalog — importing this module registers every query in the registry.

Add one import line per operator module; modules self-register via the
``@query`` decorator.
"""

from gcp_map_reduce_spark.operators import dedup, relational, similarity, text_analysis, wordcount  # noqa: F401
