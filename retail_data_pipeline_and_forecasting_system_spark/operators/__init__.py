from .depletion import greedy_inventory_depletion  # noqa: F401
from .graph import connected_components, dup_clusters  # noqa: F401
from .skew import replicated_skew_join, salted_agg  # noqa: F401
from .scd import merge_upsert, scd2_intervals  # noqa: F401
from .dedup import edit_distance_dedup  # noqa: F401
from .rollup import merge_rollup_states, rollup_state  # noqa: F401
