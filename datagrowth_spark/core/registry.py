"""Name → callable/class registry.

Pipeline specs reference processors and resources by string name
(``"Class.method"``) so specs stay JSON-serializable, mirroring the
reference's DATAGROWTH_REGISTRY dispatch
(/root/reference/datagrowth/registry/types.py:72-348,
/root/reference/datagrowth/processors/base.py:29-95).
"""

from __future__ import annotations

from typing import Any, Callable


class RegistryError(KeyError):
    pass


class Registry:
    def __init__(self) -> None:
        self._entries: dict[str, Any] = {}

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
        """Resolve ``"Class.method"`` or ``"function"`` to a callable.

        ``"Class.method"`` returns an unbound staticmethod/classmethod or a
        factory-style callable ``lambda config: getattr(Class(config), method)``
        resolution is left to the caller via :class:`ProcessorFactory`.
        """
        if "." in spec:
            cls_name, method = spec.split(".", 1)
            cls = self.get(cls_name)
            return getattr(cls, method)
        return self.get(spec)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)


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
