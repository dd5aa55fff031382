"""Plan inspection helpers — the engine's `.explain` feedback loop."""

from .inspect import assert_broadcast_join, plan_summary, pushed_filters  # noqa: F401
