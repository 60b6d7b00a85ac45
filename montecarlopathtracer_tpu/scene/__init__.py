from .objio import ObjModel, ObjMaterial, read_obj
from .scene import ScenePack, load_obj_scene, scene_pack_from_model
from .camera import Camera, camera_for_scene

__all__ = [
    "ObjModel",
    "ObjMaterial",
    "read_obj",
    "ScenePack",
    "load_obj_scene",
    "scene_pack_from_model",
    "Camera",
    "camera_for_scene",
]
