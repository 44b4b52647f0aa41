"""Declarative extraction/projection ("objectives") over raw payloads.

Objective grammar (reference:
/root/reference/datagrowth/processors/input/extraction.py:10-193):

* ``"@": path`` — selects the node collection to iterate (the explode)
* ``"#key": path`` — evaluated once against the *whole* payload, the
  value is broadcast onto every output row ("context")
* ``"key": path`` — evaluated per exploded node
* any value may be a Python callable instead of a path

Two execution paths:

* :func:`extract_df` — schema-free: Arrow-batched ``mapInPandas`` with
  ``json.loads`` + :func:`reach` per body. Output rows carry the encoded
  ``MAP<STRING,STRING>`` properties representation, ready for
  ``Collection.add``. Correct for arbitrary JSON; Python-side cost.
* :func:`extract_typed_df` — scale path: when the caller declares the
  node schema, compiles to ``from_json`` → ``explode`` → ``select``
  (whole-stage codegen, no Python). Use this in hot pipelines.

HTML/XML extraction (reference extraction.py:156-193) evaluates
BeautifulSoup expressions; gated behind an import-try because bs4 is an
optional dependency.
"""

from __future__ import annotations

import json
from types import GeneratorType
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datagrowth_spark.core.reach import reach
from datagrowth_spark.datatypes.document import PROPERTIES_TYPE, encode_properties

try:
    import bs4  # noqa: F401

    HAS_BS4 = True
except ImportError:
    HAS_BS4 = False


class DGNoContent(Exception):
    """The '@' path resolved to nothing (reference exceptions.py DGNoContent)."""


def is_json_mimetype(mimetype: str) -> bool:
    return mimetype.split(";")[0].strip() in (
        "application/json", "text/json",
    ) or mimetype.split("+")[-1].split(";")[0] == "json"


class ExtractProcessor:
    """Driver/executor-side extraction engine (pure Python core).

    The pure-Python core mirrors the reference API so resource bodies can
    be extracted anywhere (driver loops, partition workers); the
    DataFrame operators below wrap it.
    """

    config_namespace = "extract_processor"

    def __init__(self, config=None, objective: dict | None = None) -> None:
        from datagrowth_spark.core.config import ConfigurationType, create_config

        if isinstance(config, dict):
            # Reference construction style: TransformProcessor(
            # config={"objective": ...}) (transformation tests :62-101).
            config = create_config(self.config_namespace, config)
        self.config = config or ConfigurationType(namespace=self.config_namespace)
        self._at = None
        self._context: dict[str, Any] = {}
        self._objective: dict[str, Any] = {}
        if objective is None:
            objective = self.config.get("objective", default=None,
                                        raise_on_missing=False)
        # Mirrors reference __init__ (extraction.py:44-50): the
        # objective loads (and validates) only when one was configured.
        if objective:
            self.load_objective(objective)

    def load_objective(self, objective: dict) -> None:
        """Split an objective into '@'/context/per-node parts, with the
        reference's validity asserts (extraction.py:52-72)."""
        assert isinstance(objective, dict), "An objective should be a dict."
        self._at = None
        self._context = {}
        self._objective = {}
        for key, value in objective.items():
            if key == "@":
                self._at = value
            elif key.startswith("#"):
                self._context[key[1:]] = value
            else:
                self._objective[key] = value
        assert self._objective or self._context, \
            f"No objectives loaded from objective {objective}"
        if self._objective:
            assert self._at, (
                "ExtractProcessor did not load elements to start with from "
                f"its objective {objective}. Make sure that '@' is specified")

    # -- resource conveniences (reference extraction.py:74-108) ------------
    def pass_resource_through(self, resource) -> Any:
        """Return a resource's data as-is, no transformation."""
        mime_type, data = resource.content
        return data

    def extract_from_resource(self, resource) -> Iterator[dict]:
        """Extract from a resource's (content_type, data) tuple using
        THIS processor's objective."""
        return self.transform(*resource.content)

    def transform_resource(self, resource) -> Iterator[dict]:
        """Alias of :meth:`extract_from_resource` under the transform
        name."""
        return self.transform(*resource.content)

    # -- core -------------------------------------------------------------
    def extract(self, content_type: str | None, data: Any):
        return self.transform(content_type, data)

    #: Dispatchable mime-handler method names. Content-Type is
    #: SERVER-CONTROLLED input, so ``transform`` only dispatches to
    #: names registered here (ADVICE r7: a bare getattr let a response
    #: typed e.g. ``load/objective`` invoke arbitrary public methods).
    #: Subclasses adding a handler (reference extraction.py:110-135:
    #: ``application/pdf`` -> ``application_pdf``) extend this set:
    #: ``content_handlers = ExtractProcessor.content_handlers | {"application_pdf"}``.
    content_handlers: frozenset[str] = frozenset(
        {"application_json", "text_html", "text_xml", "application_xml"})

    def transform(self, content_type: str | None, data: Any):
        """Dispatch on content type via a same-named method from the
        :attr:`content_handlers` allowlist."""
        if content_type is None or data is None:
            return []
        content_type = content_type.split(";")[0].strip()
        if is_json_mimetype(content_type):
            content_type = "application/json"
        name = content_type.replace("/", "_")
        method = getattr(self, name, None) if name in self.content_handlers else None
        if method is None:
            raise TypeError(
                f"Transform processor does not support content_type "
                f"{content_type}")
        return method(data)

    def _eval(self, spec: Any, node: Any) -> Any:
        if callable(spec):
            return spec(node)
        return reach(spec, node)

    def application_json(self, data: Any) -> Iterator[dict]:
        if isinstance(data, (str, bytes)):
            data = json.loads(data)
        context = {k: self._eval(v, data) for k, v in self._context.items()}
        nodes = self._eval(self._at, data) if self._at else data
        if isinstance(nodes, dict):
            if self.config.get("extract_from_object_values", default=False, raise_on_missing=False):
                nodes = list(nodes.values())
            else:
                nodes = [nodes]
        elif nodes is None:
            # Mirrors reference extraction.py:145-146 — a resolved-but-
            # empty '@' is a content error, not a silent zero-row page.
            raise DGNoContent(f"Found no nodes at {self._at}")
        elif not isinstance(nodes, (list, GeneratorType)):
            # Scalar/string nodes wrap as a single-element list
            # (extraction.py:147-148) — iterating a string directly would
            # yield one garbage row per character.
            nodes = [nodes]
        for node in nodes:
            # Context first, objective values overwrite on key clash
            # (reference extraction.py:151-154: result = copy(context),
            # then result[name] = ...).
            row = dict(context)
            for k, v in self._objective.items():
                row[k] = self._eval(v, node)
            yield row

    @staticmethod
    def _eval_extraction(name: str, objective: Any, soup: Any, el: Any = None) -> Any:
        """Mirror reference extraction.py:156-163: context/`@` callables get
        ``objective(soup)``, per-element callables get ``objective(soup, el)``;
        string objectives eval with ``soup``/``el`` in scope; eval failures
        wrap in ValueError naming the objective key."""
        if callable(objective):
            return objective(soup) if el is None else objective(soup, el)
        try:
            return eval(objective, {"soup": soup, "el": el}) if objective else None  # noqa: S307 — mirrors reference semantics
        except Exception as exc:
            raise ValueError(f"Can't extract '{name}'") from exc

    def _make_soup(self, data: Any) -> Any:
        """Raw markup parses (bs4 when installed, mini-soup otherwise);
        anything already parsed — the reference's resource layer hands
        soups straight to text_html/text_xml — passes through."""
        if not isinstance(data, (str, bytes)):
            return data
        if HAS_BS4:
            return bs4.BeautifulSoup(data, "html.parser")
        # stdlib fallback: call-compatible find/find_all/.text subset
        # (operators/html.py) so objectives work without bs4.
        from datagrowth_spark.operators.html import mini_soup

        return mini_soup(data)

    def _extract_soup(self, soup: Any) -> Iterator[dict]:
        # Reference _extract_soup (extraction.py:165-181).
        context = {
            k: self._eval_extraction(k, v, soup)
            for k, v in self._context.items()
        }
        at = elements = self._eval_extraction("@", self._at, soup)
        if not isinstance(at, (list, GeneratorType)):
            elements = [at]
        for el in elements:
            row = dict(context)
            for k, v in self._objective.items():
                if not v:
                    continue
                row[k] = self._eval_extraction(k, v, soup, el)
            yield row

    def text_html(self, data: Any) -> Iterator[dict]:
        yield from self._extract_soup(self._make_soup(data))

    def text_xml(self, data: Any) -> Iterator[dict]:
        yield from self._extract_soup(self._make_soup(data))

    def application_xml(self, data: Any) -> Iterator[dict]:
        yield from self._extract_soup(self._make_soup(data))


def content_iterator(resource_iterator, objective: dict) -> Iterator[dict]:
    """Flat-map an iterator of resources through one ExtractProcessor
    (reference processors/input/iterators.py:5-13, E5's pure-Python
    form — :func:`extract_df` is the distributed one). Error resources
    whose ``content`` is ``(None, None)`` contribute zero rows."""
    from datagrowth_spark.core.config import create_config

    config = create_config("extract_processor", {"objective": objective})
    extractor = ExtractProcessor(config=config)
    for resource in resource_iterator:
        yield from extractor.extract_from_resource(resource)


_EXTRACT_OUT_SCHEMA = T.StructType([T.StructField("properties", PROPERTIES_TYPE)])


def extract_df(df: DataFrame, body_col: str, objective: dict,
               content_type: str = "application/json",
               extract_from_object_values: bool = False,
               content_type_col: str | None = None) -> DataFrame:
    """Schema-free extraction over a DataFrame of payload strings.

    One input row (a fetched body) flat-maps to N output rows of encoded
    properties — the Spark form of ``content_iterator``
    (reference input/iterators.py:5-13). Callables in the objective are
    shipped with the closure (must be picklable). With
    ``content_type_col`` the mimetype is read per row (null falls back to
    ``content_type``) — the response-stream case where each row carries
    its own Content-Type header.
    """
    from datagrowth_spark.core.config import create_config

    config = create_config("extract_processor",
                           {"extract_from_object_values": extract_from_object_values})

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        processor = ExtractProcessor(config=config, objective=objective)
        for batch in batches:
            rows = []
            types = batch[content_type_col] if content_type_col else None
            for i, body in enumerate(batch[body_col]):
                if body is None:
                    continue
                row_type = types.iloc[i] if types is not None else None
                try:
                    for item in processor.extract(row_type or content_type, body):
                        rows.append({"properties": encode_properties(item)})
                except DGNoContent:
                    # One contentless body is that row's problem, not the
                    # task's — callers of the pure-Python API see the raise,
                    # the distributed flat-map skips the row.
                    continue
            yield pd.DataFrame(rows, columns=["properties"])

    return df.mapInPandas(run, schema=_EXTRACT_OUT_SCHEMA)


def _path_to_cols(path: str, base: F.Column) -> F.Column:
    from datagrowth_spark.functions.paths import path_col

    return path_col(base, path) if path not in (None, "$") else base


def extract_typed_df(df: DataFrame, body_col: str, objective: dict,
                     node_schema: T.DataType, at_is_array: bool = True) -> DataFrame:
    """JVM-side extraction when the node schema is declared (scale path).

    Compiles the objective to ``from_json`` + ``explode`` + ``select``:
    fully inside whole-stage codegen, columns prunable. ``node_schema``
    types one node; the ``@`` path locates the node array inside the
    parsed body. Callables are not supported here — use
    :func:`extract_df` for those.
    """
    at = None
    context: dict[str, str] = {}
    fields: dict[str, str] = {}
    for key, value in objective.items():
        assert not callable(value), "extract_typed_df does not support callables"
        if key == "@":
            at = value
        elif key.startswith("#"):
            context[key[1:]] = value
        else:
            fields[key] = value

    # Parse just enough structure: the @-array of nodes plus context paths.
    parsed_schema = _wrap_schema_for_path(at, T.ArrayType(node_schema) if at_is_array else node_schema)
    parsed = F.from_json(F.col(body_col), parsed_schema)
    nodes = _path_to_cols(at, parsed) if at else parsed

    out = df.withColumn("__node", F.explode(nodes) if at_is_array else nodes)
    cols = [
        _path_to_cols(path, F.col("__node")).alias(name)
        for name, path in fields.items()
    ]
    # Context columns come from a separately parsed (possibly different
    # shaped) view of the body; re-parse with permissive schema.
    for name, path in context.items():
        from datagrowth_spark.functions.paths import json_path_col

        cols.append(json_path_col(F.col(body_col), path).alias(name))
    return out.select(*cols)


def _wrap_schema_for_path(path: str | None, leaf: T.DataType) -> T.DataType:
    """Nest `leaf` under the struct path in `path` (e.g. $.data.items)."""
    if not path or path == "$":
        return leaf
    parts = [p for p in path[2:].split(".") if p]
    for part in reversed(parts):
        leaf = T.StructType([T.StructField(part, leaf)])
    return leaf


class TransformProcessor(ExtractProcessor):
    """Alias of ExtractProcessor under the transform name (E3, reference
    datagrowth/processors/input/transform.py:5-15); its config lives in
    its own namespace (reference transformation tests :139-141)."""

    config_namespace = "transform_processor"
