"""Relational operators (SURVEY §2.4-§2.9) re-expressed Spark-first.

Each helper is a thin, explicitly-named composition of DataFrame ops so
Catalyst sees the full declarative plan (joins reorderable, filters
pushable, small sides broadcastable). Nothing here materializes.
"""

from .aggregates import global_agg_col, group_count
from .classifier import class_prior, score_docs, train_token_llr
from .sharding import global_rank, shuffled_rank, write_shards
from .joins import (
    cross_join_defaults,
    existence_flag_join,
    lookup_join,
    range_join,
)
from .packing import pack_sequences
from .scd2 import scd2_apply, scd2_merge_snapshot
from .similarity import cell_blocked_pairs, semantic_dedup, semantic_dedup_auto
from .timeseries import interpolate_linear, resample_ffill
from .udtfs import sliding_chunks
from .setops import changed_rows, except_all_on, union_by_name
from .upsert import upsert, upsert_partitioned
from .windows import keep_first_dedup, top1_per_group

__all__ = [
    "cell_blocked_pairs",
    "semantic_dedup",
    "semantic_dedup_auto",
    "interpolate_linear",
    "resample_ffill",
    "sliding_chunks",
    "scd2_merge_snapshot",
    "changed_rows",
    "class_prior",
    "score_docs",
    "train_token_llr",
    "global_rank",
    "shuffled_rank",
    "write_shards",
    "cross_join_defaults",
    "except_all_on",
    "existence_flag_join",
    "global_agg_col",
    "group_count",
    "keep_first_dedup",
    "lookup_join",
    "pack_sequences",
    "range_join",
    "scd2_apply",
    "top1_per_group",
    "union_by_name",
    "upsert",
    "upsert_partitioned",
]
