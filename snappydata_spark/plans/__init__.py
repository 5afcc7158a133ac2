from snappydata_spark.plans.cache import PlanCache, normalize_sql
from snappydata_spark.plans.explainer import (
    physical_plan,
    exchange_count,
    scan_pushdown_info,
)

__all__ = [
    "PlanCache",
    "normalize_sql",
    "physical_plan",
    "exchange_count",
    "scan_pushdown_info",
]
