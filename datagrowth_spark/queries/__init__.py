"""Benchmark/correctness query surface (package form).

Former single-module queries.py, split by family (scripts/split_queries.py, r12). Every name the module exposed is hoisted here, so ``from datagrowth_spark import queries as Q`` and ``from datagrowth_spark.queries import <name>`` are unchanged.
"""

from datagrowth_spark.queries import _shared as _m__shared
from datagrowth_spark.queries import relational as _m_relational
from datagrowth_spark.queries import events as _m_events
from datagrowth_spark.queries import text as _m_text
from datagrowth_spark.queries import dedup as _m_dedup
from datagrowth_spark.queries import similarity as _m_similarity
from datagrowth_spark.queries import multimodal as _m_multimodal
from datagrowth_spark.queries import corpus as _m_corpus
from datagrowth_spark.queries import trainer as _m_trainer
from datagrowth_spark.queries import pipeline as _m_pipeline
from datagrowth_spark.queries import streaming as _m_streaming
from datagrowth_spark.queries import registry as _m_registry

for _m in [_m__shared, _m_relational, _m_events, _m_text, _m_dedup, _m_similarity, _m_multimodal, _m_corpus, _m_trainer, _m_pipeline, _m_streaming, _m_registry]:
    for _k in vars(_m):
        if not _k.startswith('__'):
            globals()[_k] = getattr(_m, _k)
del _m, _k
