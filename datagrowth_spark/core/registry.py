"""Name → callable/class registry.

Pipeline specs reference processors and resources by string name
(``"Class.method"``) so specs stay JSON-serializable, mirroring the
reference's DATAGROWTH_REGISTRY dispatch
(/root/reference/datagrowth/registry/types.py:72-348,
/root/reference/datagrowth/processors/base.py:29-95).

Beyond plain names, the registry supports the reference's tagged form:
``category:value`` tags (``processor:extract``) bound to classes stored
as IMPORT PATHS and resolved lazily — a pipeline spec serialized to
JSON can name a class that is only importable on the executors, and
nothing is imported until dispatch. Tags can carry a default
configuration that merges under call-time overrides
(registry/types.py:173-185), so a registered processor ships with its
tuning baked in.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, NamedTuple


class RegistryError(KeyError):
    pass


class Tag(NamedTuple):
    """``category:value`` registry key (reference registry/types.py:42-69)."""

    category: str
    value: str

    @classmethod
    def from_string(cls, string: str) -> "Tag":
        if string.count(":") != 1:
            raise ValueError(
                f"Tag string {string!r} must contain exactly one ':' "
                "separating category and value")
        category, value = string.split(":")
        return cls(category.lower(), value.lower())

    def __str__(self) -> str:
        return f"{self.category}:{self.value}"


def import_class(path: str) -> type:
    """Import ``pkg.module.Class`` (or ``pkg.module.Outer.Inner``).

    Walks the dotted path from the right to find the longest importable
    module prefix (reference registry/types.py:18-39's behavior), then
    descends attributes. Raises ImportError naming the path on failure.
    """
    parts = path.split(".")
    for index in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:index])
        try:
            module = importlib.import_module(module_name)
        except ModuleNotFoundError as error:
            if error.name and module_name.startswith(error.name):
                continue
            raise
        obj: Any = module
        for attribute in parts[index:]:
            obj = getattr(obj, attribute)
        if not isinstance(obj, type):
            raise TypeError(f"Expected a class at import path '{path}', got {type(obj)}")
        return obj
    raise ImportError(f"Could not import class path '{path}'")


class Registry:
    def __init__(self) -> None:
        self._entries: dict[str, Any] = {}
        self._classes: dict[Tag, type | str] = {}
        self._configurations: dict[Tag, dict[str, Any]] = {}

    def register(self, name: str | None = None, obj: Any = None):
        """Register an object, usable as decorator or direct call."""
        if obj is not None:
            self._entries[name or getattr(obj, "__name__", str(obj))] = obj
            return obj

        def decorator(target: Any) -> Any:
            self._entries[name or target.__name__] = target
            return target

        return decorator

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise RegistryError(f"'{name}' is not registered (known: {sorted(self._entries)})")
        return self._entries[name]

    def resolve(self, spec: str) -> Callable:
        """Resolve ``"Class.method"``, ``"function"``, or a full import
        path (``"pkg.mod.Class.method"``) to a callable.

        Registered names win; an unregistered dotted spec falls back to
        lazy import-path resolution so config-serialized pipelines can
        reference project classes that were never explicitly registered.
        """
        if "." in spec:
            cls_name, method = spec.split(".", 1)
            if cls_name in self._entries:
                return getattr(self.get(cls_name), method)
            if spec.count(".") >= 2:
                cls_path, attr = spec.rsplit(".", 1)
                try:
                    return getattr(import_class(cls_path), attr)
                except (ImportError, AttributeError, TypeError):
                    pass
            return getattr(self.get(cls_name), method)  # raises RegistryError
        return self.get(spec)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)

    # -- tagged registration (reference registry/types.py:143-223) --------
    def register_class(self, tag: str | Tag, cls: type | str,
                       config: dict[str, Any] | None = None) -> Tag:
        """Bind a ``category:value`` tag to a class.

        ``cls`` may be the class itself or its import path. A path is
        stored as-is and resolved lazily at dispatch — registration
        never forces an import, and a path-only registry stays
        serializable. Optional ``config`` becomes the tag's default
        configuration, merged under call-time overrides by
        :meth:`build_tagged`.
        """
        if isinstance(tag, str):
            tag = Tag.from_string(tag)
        self._classes[tag] = cls
        if config:
            self._configurations[tag] = dict(config)
        return tag

    def unregister_class(self, tag: str | Tag) -> None:
        if isinstance(tag, str):
            tag = Tag.from_string(tag)
        del self._classes[tag]
        self._configurations.pop(tag, None)

    def get_class(self, tag: str | Tag, category: str | None = None) -> type:
        """Resolve a tag to its class, importing lazily."""
        if isinstance(tag, str):
            tag = Tag.from_string(tag)
        if category and tag.category != category:
            raise RegistryError(
                f"Expected a '{category}' tag but got '{tag.category}' ({tag})")
        if tag not in self._classes:
            raise RegistryError(
                f"{tag} is not registered (known: {sorted(map(str, self._classes))})")
        entry = self._classes[tag]
        return entry if isinstance(entry, type) else import_class(entry)

    def build_tagged(self, tag: str | Tag, overrides: dict[str, Any] | None = None,
                     category: str | None = None) -> Any:
        """Instantiate a tagged class with its registered defaults merged
        under call-time overrides (overrides win — reference
        registry/types.py:173-185)."""
        from datagrowth_spark.core.config import create_config

        if isinstance(tag, str):
            tag = Tag.from_string(tag)
        cls = self.get_class(tag, category=category)
        merged = dict(self._configurations.get(tag, {}))
        merged.update(overrides or {})
        namespace = getattr(cls, "config_namespace", "global")
        return cls(create_config(namespace, merged))

    def get_processor(self, tag: str | Tag, overrides: dict[str, Any] | None = None) -> Any:
        return self.build_tagged(tag, overrides, category="processor")

    def get_resource(self, tag: str | Tag, overrides: dict[str, Any] | None = None) -> Any:
        return self.build_tagged(tag, overrides, category="resource")

    def tags(self, category: str | None = None) -> list[Tag]:
        return sorted(t for t in self._classes if category is None or t.category == category)


_default_registry = Registry()


def get_registry() -> Registry:
    return _default_registry


class ProcessorFactory:
    """Build a processor instance + bound method from a string spec.

    Mirrors /root/reference/datagrowth/processors/base.py:64-95: a spec
    ``"SomeProcessor.some_method"`` plus defaults builds the processor with
    a config and returns the bound method to apply.
    """

    def __init__(self, processor: str, method: str | None = None, defaults: dict | None = None,
                 registry: Registry | None = None) -> None:
        if method is None:
            processor, method = processor.split(".", 1)
        self.processor_name = processor
        self.method_name = method
        self.defaults = defaults or {}
        self.registry = registry or get_registry()

    def build(self, config: dict | None = None) -> Callable:
        from datagrowth_spark.core.config import create_config

        cls = self.registry.get(self.processor_name)
        merged = dict(self.defaults)
        merged.update(config or {})
        namespace = getattr(cls, "config_namespace", "global")
        instance = cls(create_config(namespace, merged))
        return getattr(instance, self.method_name)
