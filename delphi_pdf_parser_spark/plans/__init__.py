"""Physical-plan inspection helpers (the .explain feedback loop)."""

from .inspect import explain_str, plan_report  # noqa: F401
