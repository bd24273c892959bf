from .checks import (
    chi2_categorical,
    column_profile,
    ks_two_sample,
    flatten_invariants,
    multi_table_summary,
    population_stability_index,
    quality_gate,
    table_stats,
    validate_post_load,
    validate_pre_load,
)
from .expectations import expect, expectations_gate
from .monitor import (
    alert_conditions,
    cycle_summary,
    health_score,
    production_health,
    record_cycle,
    schedule_accuracy,
)

__all__ = [
    "table_stats",
    "ks_two_sample",
    "chi2_categorical",
    "column_profile",
    "population_stability_index",
    "multi_table_summary",
    "flatten_invariants",
    "validate_pre_load",
    "validate_post_load",
    "quality_gate",
    "expect",
    "expectations_gate",
    "cycle_summary",
    "alert_conditions",
    "record_cycle",
    "schedule_accuracy",
    "health_score",
    "production_health",
]
