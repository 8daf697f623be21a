"""Spark layer: distributed sketch build / merge / probe over DataFrames.

The lifecycle (SURVEY.md §3.4):

1. **build** — ``mapInArrow`` over the (column-pruned) input: each partition
   folds its Arrow batches into one local kernel and emits a single
   ``(state, rows, ...)`` row.  One Arrow crossing, zero per-row Python.
2. **exchange/merge** — the few small partial rows are tree-combined
   Spark-side when there are many partitions, then folded on the driver.
   All merges are the kernels' associative ops.
3. **probe** — the merged state is broadcast; vectorized pandas UDFs flag /
   count / estimate per row of any DataFrame.
"""

from sketchlib.spark.session import get_spark
from sketchlib.spark.agg import build_many, build_sketch, sketch_partials
from sketchlib.spark import probe  # noqa: F401
from sketchlib.spark.cuckoo_dist import build_sharded_cuckoo, cuckoo_probe_column  # noqa: F401
from sketchlib.spark.rollup import merge_range, read_rollup, sketch_rollup, write_rollup  # noqa: F401
from sketchlib.spark.prehash import PREHASH_SALT, prehash_pair  # noqa: F401
from sketchlib.spark.sql_udaf import register_sql_udafs, sketch_state_agg, state_merge_agg  # noqa: F401
from sketchlib.spark.hll_sql import build_hll_sql, hll_register_rows, hll_sql_rollup  # noqa: F401
from sketchlib.spark.cms_sql import cms_cell_rows, cms_sql_estimates  # noqa: F401
from sketchlib.spark.bloom_sql import (  # noqa: F401
    bloom_sql_members,
    bloom_word_rows,
    build_bloom_sql,
    build_cbloom_sql,
    build_tdbloom_sql,
    build_tdcbloom_sql,
    cbloom_cell_rows,
    cbloom_sql_counts,
    tdbloom_cell_rows,
    tdbloom_sql_members,
    tdcbloom_cell_rows,
    tdcbloom_from_cells,
    tdcbloom_sql_counts,
)
from sketchlib.spark.suite_sql import (  # noqa: F401
    build_cms_sql_km,
    build_sketch_sql,
    build_suite_sql,
    materialize_suite_cells,
    merge_suite_cells,
    read_suite_cells,
    run_suite_sql,
    suite_cell_rows,
    write_suite_cells,
)
from sketchlib.spark.sessions import session_stats, session_windows_stream, sessionize  # noqa: F401
from sketchlib.spark.archbloom_source import (  # noqa: F401
    ArchbloomDataSource,
    import_merged,
    kernel_from_row,
)
from sketchlib.spark.joins import bloom_prune, bloom_pruned_join  # noqa: F401
from sketchlib.spark.partitioning import (  # noqa: F401
    quantile_cuts,
    range_bucket,
    repartition_by_quantiles,
)
