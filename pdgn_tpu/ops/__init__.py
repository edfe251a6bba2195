"""Point operator library (TPU-native equivalents of lib/pointops)."""

from pdgn_tpu.ops.ballquery import ballquery
from pdgn_tpu.ops.edges import edge_features, edge_features_xyz
from pdgn_tpu.ops.featuredistribute import feature_distribute, feature_gather
from pdgn_tpu.ops.grouping import (
    group_all,
    group_xyz,
    grouping,
    grouping_int,
    le_query_and_group,
    le_query_and_group_only_feature,
    le_query_and_group_same_size,
    query_and_group,
    query_and_group_dilate,
)
from pdgn_tpu.ops.interpolation import (
    interpolate,
    three_interpolate_weights,
    three_nn,
)
from pdgn_tpu.ops.knn import knn, knn_exclude_first, knn_naive
from pdgn_tpu.ops.labelstat import (
    labelstat_and_ballquery,
    labelstat_ballrange,
    labelstat_idx,
)
from pdgn_tpu.ops.pairwise import pairwise_sqdist, self_pairwise_sqdist
from pdgn_tpu.ops.sampling import furthest_point_sample, gather_points

__all__ = [
    "ballquery",
    "edge_features",
    "edge_features_xyz",
    "feature_distribute",
    "feature_gather",
    "furthest_point_sample",
    "gather_points",
    "group_all",
    "group_xyz",
    "grouping",
    "grouping_int",
    "interpolate",
    "knn",
    "knn_exclude_first",
    "knn_naive",
    "labelstat_and_ballquery",
    "labelstat_ballrange",
    "labelstat_idx",
    "le_query_and_group",
    "le_query_and_group_only_feature",
    "le_query_and_group_same_size",
    "pairwise_sqdist",
    "query_and_group",
    "query_and_group_dilate",
    "self_pairwise_sqdist",
    "three_interpolate_weights",
    "three_nn",
]
