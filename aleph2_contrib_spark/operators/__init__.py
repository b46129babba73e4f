"""Operator package. Shared oracle-SQL helpers live here (no Spark
imports — safe for every operator module to import)."""

from __future__ import annotations


def sql_str(value: str) -> str:
    """Escape a Python value for interpolation into a single-quoted SQL
    string literal in a generated oracle (ANSI doubling: ' -> ''). Every
    oracle builder that embeds a USER-PROVIDED value (funnel step names,
    sample seeds, ...) must route it through here — a value containing a
    quote would otherwise break or inject into the generated SQL."""
    return str(value).replace("'", "''")
