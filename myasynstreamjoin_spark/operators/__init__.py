from myasynstreamjoin_spark.operators.asyn_join import (
    min_count_per_key,
    min_count_per_window,
)
from myasynstreamjoin_spark.operators.grouping import (
    collect_count_per_key,
    count_per_key,
    agg_per_window,
)
from myasynstreamjoin_spark.operators.stats import (
    batch_stats,
    heavy_hitters,
    key_counts,
    skew_p1,
)
from myasynstreamjoin_spark.operators.star_join import (
    star_cardinality,
    star_cardinality_hypercube,
    star_join_count,
)
from myasynstreamjoin_spark.operators.skew import salted_agg, split_skew_agg
from myasynstreamjoin_spark.operators.cost_model import (
    adaptive_agg,
    batch_strategy,
    per_window_strategy,
)
from myasynstreamjoin_spark.operators.relational import (
    churned_customers,
    distinct_users_per_type,
    regional_revenue,
    repeat_customers,
    rollup_pricing,
    topk_per_group,
)

__all__ = [
    "adaptive_agg",
    "batch_strategy",
    "per_window_strategy",
    "rollup_pricing",
    "topk_per_group",
    "distinct_users_per_type",
    "repeat_customers",
    "churned_customers",
    "regional_revenue",
    "min_count_per_key",
    "min_count_per_window",
    "count_per_key",
    "collect_count_per_key",
    "agg_per_window",
    "key_counts",
    "heavy_hitters",
    "skew_p1",
    "batch_stats",
    "star_cardinality",
    "star_cardinality_hypercube",
    "star_join_count",
    "salted_agg",
    "split_skew_agg",
]
