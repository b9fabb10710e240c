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
from myasynstreamjoin_spark.operators.asof import asof_join
from myasynstreamjoin_spark.operators.grouping import count_per_sliding_window
from myasynstreamjoin_spark.operators.rangejoin import range_join
from myasynstreamjoin_spark.operators.relational import (
    churned_customers,
    cube_pricing,
    customers_without_orders,
    distinct_users_per_type,
    event_type_pivot,
    hash_bucket,
    large_orders,
    late_shipment_priority_counts,
    latest_snapshot,
    profile_columns,
    promo_revenue,
    regional_revenue,
    repeat_customers,
    rollup_pricing,
    sampled_revenue,
    shipping_priority,
    small_qty_revenue,
    stratified_sample,
    topk_per_group,
    value_percentiles,
)
from myasynstreamjoin_spark.operators.sessions import event_gaps, sessionize
from myasynstreamjoin_spark.operators.stats import approx_distinct_audit
from myasynstreamjoin_spark.operators.zorder import with_zvalue, write_zordered

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
    "asof_join",
    "range_join",
    "sessionize",
    "event_gaps",
    "count_per_sliding_window",
    "cube_pricing",
    "customers_without_orders",
    "event_type_pivot",
    "hash_bucket",
    "large_orders",
    "late_shipment_priority_counts",
    "latest_snapshot",
    "profile_columns",
    "promo_revenue",
    "sampled_revenue",
    "shipping_priority",
    "small_qty_revenue",
    "stratified_sample",
    "value_percentiles",
    "approx_distinct_audit",
    "with_zvalue",
    "write_zordered",
]
