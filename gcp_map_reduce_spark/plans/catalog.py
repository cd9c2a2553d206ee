"""Catalog — importing this module registers every query in the registry.

Add one import line per operator module; modules self-register via the
``@query`` decorator.
"""

from gcp_map_reduce_spark.operators import (  # noqa: F401,I001
    clustering,
    dedup,
    multimodal,
    pipeline,
    relational,
    relational_ext,
    scale,
    similarity,
    text_analysis,
    udf_plugin,
    wordcount,
)  # noqa: F401
