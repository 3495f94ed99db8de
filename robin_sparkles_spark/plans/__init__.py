"""Plan auditing — explain()-based checks that the physical plans are
the ones a 100 TB deployment needs (SURVEY.md §4 discipline)."""

from .audit import PlanAudit, audit_plan

__all__ = ["PlanAudit", "audit_plan"]
