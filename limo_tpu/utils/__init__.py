from .cache import enable_compilation_cache
from .checkpoint import dump_map, load_adjuster, save_adjuster
from .profiling import StageTimer, device_trace
from .transforms import TransformLookupError, TransformTree
from .viz import (accumulate_map, color_by_index_hsv, export_landmarks,
                  export_paths, export_planes, flow_image, write_ply)

__all__ = [
    "enable_compilation_cache",
    "dump_map", "load_adjuster", "save_adjuster",
    "StageTimer", "device_trace",
    "TransformLookupError", "TransformTree",
    "accumulate_map", "color_by_index_hsv", "export_landmarks",
    "export_paths", "export_planes", "flow_image", "write_ply",
]
