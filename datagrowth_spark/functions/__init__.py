"""Column-level function library (JVM-side wherever possible)."""

from datagrowth_spark.functions.paths import (
    path_col,
    json_path_col,
    compile_output_spec,
    output_from_content,
)

__all__ = [
    "path_col",
    "json_path_col",
    "compile_output_spec",
    "output_from_content",
]
