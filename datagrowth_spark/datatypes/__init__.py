"""DataFrame-native data model: Documents, Collections, Datasets."""

from datagrowth_spark.datatypes.document import (
    DOCUMENT_SCHEMA,
    decode_properties,
    encode_properties,
    document_content,
    prop_col,
)
from datagrowth_spark.datatypes.collection import Collection

__all__ = [
    "DOCUMENT_SCHEMA",
    "Collection",
    "decode_properties",
    "encode_properties",
    "document_content",
    "prop_col",
]
