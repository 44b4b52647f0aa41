"""Layered configuration with namespace fallback.

Re-expresses the reference's ``ConfigurationType`` semantics
(/root/reference/datagrowth/configuration/types.py:11-268) without
Django: a config instance carries a ``namespace`` and a ``private``
prefix list; attribute lookup tries ``<namespace>_<key>`` then
``global_<key>`` in the defaults; ``$``-prefixed keys mark end-user
input (kept but surfaced without the prefix); ``_``-prefixed keys are
protected (serialized only when explicitly requested).

The whole object serializes to a plain dict so pipeline specs stay
JSON-serializable across driver/executor boundaries.
"""

from __future__ import annotations

import copy
from typing import Any, Iterator

DEFAULT_CONFIG: dict[str, Any] = {
    # global namespace
    "global_batch_size": 100,
    "global_max_batch_size": 100,
    "global_cache_only": False,
    "global_purge_immediately": False,
    "global_purge_after": {},
    "global_sample_size": 0,
    # http_resource namespace
    "http_resource_timeout": 30,
    "http_resource_continuation_limit": 1,
    "http_resource_interval_duration": 0,
    "http_resource_backoff_delays": [2, 4, 8, 16],
    "http_resource_concat_args_size": 0,
    "http_resource_concat_args_symbol": "|",
    # extract_processor namespace
    "extract_processor_extract_from_object_values": False,
    # growth_processor namespace
    "growth_processor_growth_phase": None,
    "growth_processor_depends_on": None,
    "growth_processor_batch_size": 100,
    "growth_processor_asynchronous": False,
    "growth_processor_retrieve_data": {},
    "growth_processor_contribute_data": {},
    "growth_processor_extractor": "ExtractProcessor.extract_from_resource",
    "growth_processor_to_property": None,
    "growth_processor_apply_resource_to": [],
}


class ConfigurationNotFoundError(AttributeError):
    pass


class ConfigurationType:
    """Layered key/value config with namespace → global fallback."""

    def __init__(
        self,
        defaults: dict[str, Any] | None = None,
        namespace: str = "global",
        private: tuple[str, ...] = ("_defaults", "_namespace", "_private"),
    ) -> None:
        object.__setattr__(self, "_defaults", dict(DEFAULT_CONFIG if defaults is None else defaults))
        object.__setattr__(self, "_namespace", namespace)
        object.__setattr__(self, "_private", list(private))
        object.__setattr__(self, "_config", {})

    # -- mutation ---------------------------------------------------------
    def update(self, **kwargs: Any) -> None:
        for key, value in kwargs.items():
            self._set(key, value)

    def _set(self, key: str, value: Any) -> None:
        if key.startswith("$"):
            # user input key: store under the stripped name, flagged
            self._config[key[1:]] = value
            self._config.setdefault("_user_keys", [])
            if key[1:] not in self._config["_user_keys"]:
                self._config["_user_keys"].append(key[1:])
        else:
            self._config[key] = value

    def supplement(self, **kwargs: Any) -> None:
        """Set keys only when not already configured."""
        for key, value in kwargs.items():
            name = key[1:] if key.startswith("$") else key
            if name not in self._config:
                self._set(key, value)

    # -- lookup -----------------------------------------------------------
    def __getattr__(self, item: str) -> Any:
        if item.startswith("_"):
            raise AttributeError(item)
        return self.get(item)

    def __setattr__(self, key: str, value: Any) -> None:
        self._set(key, value)

    def get(self, item: str, default: Any = None, *, raise_on_missing: bool = True) -> Any:
        config = object.__getattribute__(self, "_config")
        if item in config:
            return config[item]
        defaults = object.__getattribute__(self, "_defaults")
        namespace = object.__getattribute__(self, "_namespace")
        for candidate in (f"{namespace}_{item}", f"global_{item}"):
            if candidate in defaults:
                return defaults[candidate]
        if raise_on_missing and default is None:
            raise ConfigurationNotFoundError(
                f"Configuration '{item}' not found in namespace '{namespace}' nor in globals"
            )
        return default

    def has(self, item: str) -> bool:
        try:
            self.get(item)
            return True
        except ConfigurationNotFoundError:
            return False

    # -- serde ------------------------------------------------------------
    def to_dict(self, protected: bool = False, private: bool = False) -> dict[str, Any]:
        out = {}
        for key, value in self._config.items():
            if key == "_user_keys":
                continue
            if key.startswith("_") and not protected:
                continue
            out[key] = copy.deepcopy(value)
        if private:
            out["_namespace"] = self._namespace
            out["_private"] = list(self._private)
        return out

    @classmethod
    def from_dict(cls, config: dict[str, Any], defaults: dict[str, Any] | None = None) -> "ConfigurationType":
        config = dict(config)
        namespace = config.pop("_namespace", "global")
        config.pop("_private", None)
        instance = cls(defaults=defaults, namespace=namespace)
        instance.update(**config)
        return instance

    def clone(self) -> "ConfigurationType":
        return ConfigurationType.from_dict(
            self.to_dict(protected=True, private=True),
            defaults=object.__getattribute__(self, "_defaults"),
        )

    def __contains__(self, item: str) -> bool:
        return self.has(item)

    def items(self) -> Iterator[tuple[str, Any]]:
        return iter(self.to_dict(protected=True).items())

    def __repr__(self) -> str:  # pragma: no cover
        return f"ConfigurationType(namespace={self._namespace!r}, config={self._config!r})"


def create_config(namespace: str, config: dict[str, Any], defaults: dict[str, Any] | None = None) -> ConfigurationType:
    instance = ConfigurationType(defaults=defaults, namespace=namespace)
    instance.update(**config)
    return instance
