"""Placeholder for C++ native ingest bindings (built later rounds/commits)."""


def available() -> bool:
    return False
