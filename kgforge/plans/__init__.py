"""Physical-plan inspection helpers (SURVEY.md 4.2 discipline checks)."""

from kgforge.plans.inspect import physical_plan, plan_contains

__all__ = ["physical_plan", "plan_contains"]
