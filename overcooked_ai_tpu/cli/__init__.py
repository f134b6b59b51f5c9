"""CLI entry points (console scripts; see pyproject.toml [project.scripts])."""
