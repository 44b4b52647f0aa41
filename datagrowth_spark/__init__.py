"""datagrowth_spark — a PySpark-native ETL/analytics engine.

A from-scratch re-expression of the capabilities of fako/datagrowth
(declarative JSON extraction, keyed document collections with upsert
semantics, cached external-resource fetch, growth/enrichment pipelines,
dataset versioning) as idiomatic Spark DataFrame programs, extended with
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design stance: DataFrames + driver-side orchestration. Logical plans are
declared with the DataFrame/SQL API so Catalyst handles pushdown, pruning
and join planning; Python UDFs are confined to genuinely non-relational
steps (HTML parsing, external fetches) and always Arrow-batched.
"""

__version__ = "0.1.0"

from datagrowth_spark.core.config import ConfigurationType, create_config
from datagrowth_spark.core.registry import Registry, get_registry

__all__ = [
    "ConfigurationType",
    "create_config",
    "Registry",
    "get_registry",
    "__version__",
]
