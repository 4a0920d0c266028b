"""Utilities: torch-weight conversion, logging/observability, profiling."""
