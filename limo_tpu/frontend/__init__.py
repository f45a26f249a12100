from .essential import EssentialResult, estimate_essential, motion_prior_unscaled
from .groundplane import PlaneResult, estimate_groundplane, fit_plane_lsq

__all__ = [
    "EssentialResult", "estimate_essential", "motion_prior_unscaled",
    "PlaneResult", "estimate_groundplane", "fit_plane_lsq",
]
