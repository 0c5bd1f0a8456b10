from .joins import asof_join, interval_join, join  # noqa: F401
from .grouping import by, colwise, groupby  # noqa: F401
from .sorting import (  # noqa: F401
    global_ntile,
    global_row_number,
    issorted,
    order,
    sort,
    sortperm,
    top_k,
)
from .setops import (  # noqa: F401
    except_rows,
    hcat,
    intersect_rows,
    isequal_df,
    vcat,
)
from .reshape import (  # noqa: F401
    crosstab,
    cut,
    melt,
    paste_columns,
    pivot_table,
    stack,
    unstack,
)
from .sampling import sample, sample_by, systematic_sample  # noqa: F401
from .skew import key_skew_report, salted_join  # noqa: F401
from .privacy import k_anonymity_report, k_anonymize  # noqa: F401
from .window import (  # noqa: F401
    cummax,
    cummin,
    cumprod,
    cumsum,
    diff,
    ewma,
    percent_change,
    reldiff,
    rolling_stats,
    rolling_window,
    with_running,
)
from .scd import scd2_from_log, scd2_merge  # noqa: F401
from .scd import funnel_counts, funnel_steps  # noqa: F401
from .graph import pagerank  # noqa: F401
from .bloom import bloom_build, bloom_prefilter  # noqa: F401
from .bloom import cm_build, cm_estimate  # noqa: F401
from .bloom import hll_build, hll_estimate, hll_merge  # noqa: F401
from .bloom import kmv_build, kmv_estimate, kmv_overlap, kmv_union  # noqa: F401
from .intervals import merge_intervals  # noqa: F401
from .diff import diff_summary, table_diff  # noqa: F401
from .frequency import heavy_hitters, mg_partition_summaries  # noqa: F401
from .selection import (  # noqa: F401
    exact_median,
    exact_quantiles,
    exact_ranks,
    weighted_median,
    weighted_quantiles,
)
from .resample import resample  # noqa: F401
from .markov import transition_counts, transition_matrix  # noqa: F401
from .basket import frequent_pairs  # noqa: F401
from .histogram import equidepth_histogram  # noqa: F401
from .integrity import check_relation, integrity_report  # noqa: F401
from .diff import apply_diff  # noqa: F401
from .graph import triangle_count  # noqa: F401
from .inequality import gini, lorenz_deciles  # noqa: F401
from .integrity import benford_audit  # noqa: F401
from .scd import survivorship  # noqa: F401
from .graph import degree_assortativity  # noqa: F401
from .reshape import collapse_rare  # noqa: F401
from .selection import exact_ranks_n  # noqa: F401
from .qsketch import (  # noqa: F401
    merge_quantile_sketches,
    quantile_sketch,
    sketch_quantiles,
)
from .attribution import attribute_conversions  # noqa: F401
from .basket import npmi_pairs  # noqa: F401
from .encoding import target_encode  # noqa: F401
from .expectations import expect  # noqa: F401
