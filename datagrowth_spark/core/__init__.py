"""Kernel utilities with no Spark dependency: config, registry, reach."""
