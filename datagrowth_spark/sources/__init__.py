"""Source operators: cached external fetches (HTTP, shell) as DataFrame
transforms — requests in, responses out, memoized in a cache table."""

from datagrowth_spark.sources.signatures import make_signature, http_signature, shell_signature
from datagrowth_spark.sources.cache import ResourceCache, fetch
from datagrowth_spark.sources.tika import binary_signature, extract_text

__all__ = ["make_signature", "http_signature", "shell_signature", "ResourceCache", "fetch",
           "binary_signature", "extract_text"]
