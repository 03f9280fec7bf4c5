"""Physical-plan introspection and scale-invariant auditing."""

from .audit import PlanAudit, assert_scalable, audit, explain_str  # noqa: F401
