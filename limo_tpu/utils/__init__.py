from .cache import enable_compilation_cache
from .checkpoint import dump_map, load_adjuster, save_adjuster
from .profiling import StageTimer, device_trace
from .viz import (accumulate_map, export_landmarks, export_paths,
                  export_planes, write_ply)

__all__ = [
    "enable_compilation_cache",
    "dump_map", "load_adjuster", "save_adjuster",
    "StageTimer", "device_trace",
    "accumulate_map", "export_landmarks", "export_paths", "export_planes",
    "write_ply",
]
