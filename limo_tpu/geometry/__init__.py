from . import quaternion, pose, camera, triangulation
from .camera import CameraRig

__all__ = ["quaternion", "pose", "camera", "triangulation", "CameraRig"]
