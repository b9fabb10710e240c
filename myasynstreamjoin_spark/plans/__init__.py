from myasynstreamjoin_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    n_shuffles,
    scan_report,
)

__all__ = ["formatted_plan", "scan_report", "has_broadcast_join", "n_shuffles"]
