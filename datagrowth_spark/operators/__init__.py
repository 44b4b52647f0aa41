"""DataFrame operators: extraction, dedup, similarity, text analysis."""

from datagrowth_spark.operators.extraction import ExtractProcessor, extract_df, extract_typed_df

__all__ = ["ExtractProcessor", "extract_df", "extract_typed_df"]
