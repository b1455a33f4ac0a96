"""Shared utilities: checkpoint import/export, registries, config, logging."""
