"""CLI entry points (reference ``run/*.py`` equivalents)."""
