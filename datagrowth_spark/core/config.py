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


# -- defaults registration & loading ---------------------------------------
#
# Mirrors the reference's runtime defaults surface: ``register_defaults``
# (configuration/types.py:371-388) flattens a per-namespace dict into the
# shared defaults, and the loaders module (configuration/loaders.py)
# discovers a project ``datagrowth.*`` config file by walking up from the
# working directory and overlays ``DATAGROWTH_*`` environment variables,
# coercing each value by the type of the existing default and warning on
# unknown keys.

ENV_PREFIX = "DATAGROWTH_SPARK"


def register_defaults(namespace: str, configuration: dict[str, Any]) -> None:
    """Register namespace defaults at runtime (a library's configure step).

    Keys become available to every subsequently-created config in that
    namespace — including configs rehydrated from serialized pipeline
    specs on executors, which is why this updates the shared module-level
    defaults rather than any one instance.
    """
    DEFAULT_CONFIG.update(
        {f"{namespace}_{key}": value for key, value in configuration.items()}
    )


def _coerce(value: str, default_value: Any) -> Any:
    """Coerce an env/file string by the type of the existing default."""
    import json as _json

    if isinstance(default_value, bool):
        return value.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default_value, int) and not isinstance(default_value, bool):
        try:
            return int(value)
        except ValueError:
            return value
    if isinstance(default_value, float):
        try:
            return float(value)
        except ValueError:
            return value
    if isinstance(default_value, (dict, list)) or default_value is None:
        try:
            return _json.loads(value)
        except (TypeError, ValueError):
            return value
    return value


def discover_defaults_file(start_directory: str | None = None) -> str | None:
    """Find a project ``datagrowth.{json,yml,yaml}`` walking up from cwd."""
    import os

    directory = os.path.abspath(start_directory or os.getcwd())
    while True:
        for suffix in ("json", "yml", "yaml"):
            candidate = os.path.join(directory, f"datagrowth.{suffix}")
            if os.path.isfile(candidate):
                return candidate
        parent = os.path.dirname(directory)
        if parent == directory:
            return None
        directory = parent


def load_defaults_file(path: str) -> list[str]:
    """Load ``{namespace: {key: value}}`` defaults from a JSON/YAML file.

    YAML needs PyYAML (optional); JSON always works. Returns the loaded
    namespaces. Unknown structure raises — a defaults file that silently
    does nothing is worse than an error.
    """
    import json as _json

    with open(path) as handle:
        text = handle.read()
    if path.endswith((".yml", ".yaml")):
        try:
            import yaml
        except ImportError as exc:
            raise ImportError(
                f"{path} is YAML but PyYAML is not installed; use datagrowth.json"
            ) from exc
        data = yaml.safe_load(text)
    else:
        data = _json.loads(text)
    if not isinstance(data, dict) or not all(isinstance(v, dict) for v in data.values()):
        raise ValueError(f"{path}: expected {{namespace: {{key: value}}}} structure")
    for namespace, configuration in data.items():
        register_defaults(namespace, configuration)
    return sorted(data)


def load_env_defaults(environ: dict[str, str] | None = None) -> dict[str, Any]:
    """Overlay ``DATAGROWTH_SPARK_<FLAT_KEY>`` environment variables.

    ``DATAGROWTH_SPARK_HTTP_RESOURCE_TIMEOUT=60`` sets
    ``http_resource_timeout``; values coerce by the existing default's
    type. Unknown keys are ignored with a warning (reference
    loaders.py:40-48) — an env typo must not silently become config.
    """
    import logging
    import os

    applied: dict[str, Any] = {}
    env = os.environ if environ is None else environ
    prefix = f"{ENV_PREFIX}_"
    for key, value in env.items():
        if not key.startswith(prefix):
            continue
        flat = key[len(prefix):].lower()
        if flat in DEFAULT_CONFIG:
            applied[flat] = _coerce(value, DEFAULT_CONFIG[flat])
        else:
            logging.getLogger("datagrowth_spark").warning(
                "Ignoring unknown configuration from env: %s (no default named %s)",
                key, flat,
            )
    DEFAULT_CONFIG.update(applied)
    return applied


def load_defaults(start_directory: str | None = None,
                  environ: dict[str, str] | None = None) -> None:
    """Project bootstrap: defaults file (if discovered) then env overlay —
    env wins, matching the reference loader precedence."""
    path = discover_defaults_file(start_directory)
    if path:
        load_defaults_file(path)
    load_env_defaults(environ)
