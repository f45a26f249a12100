from .essential import EssentialResult, estimate_essential, motion_prior_unscaled
from .groundplane import PlaneResult, estimate_groundplane, fit_plane_lsq
from .lidar_depth import (DepthResult, LidarDepthConfig, estimate_depths,
                          gather_neighbors, ground_feature_depths,
                          ground_patch_depths)
from .semantics import attach_labels, dilate_labels, sample_labels
from .tracker import FeatureTracker, Features, MatchResult, TrackerConfig, detect, match

__all__ = [
    "EssentialResult", "estimate_essential", "motion_prior_unscaled",
    "PlaneResult", "estimate_groundplane", "fit_plane_lsq",
    "DepthResult", "LidarDepthConfig", "estimate_depths", "gather_neighbors",
    "ground_feature_depths", "ground_patch_depths",
    "attach_labels", "dilate_labels", "sample_labels",
    "FeatureTracker", "Features", "MatchResult", "TrackerConfig", "detect",
    "match",
]
