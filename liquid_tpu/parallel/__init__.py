"""Multi-chip scale-out (mesh + collectives)."""
from liquid_tpu.parallel.dist import (  # noqa: F401
    DATA_AXIS, dist_filter_agg, dist_filter_count, dist_shuffle_by_key,
    make_mesh, replicate, shard_rows,
)
