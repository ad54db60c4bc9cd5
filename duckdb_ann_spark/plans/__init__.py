from .planner import PlanDecision, topk_auto  # noqa: F401
