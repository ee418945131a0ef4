from .base_scene import BaseScene, SceneObject, FlatGeometry
from .wavefront import load_wavefront_obj
from .materials import MaterialDesc, load_material_descs, MaterialTable
from .lights import make_light

__all__ = [
    "BaseScene",
    "SceneObject",
    "FlatGeometry",
    "load_wavefront_obj",
    "MaterialDesc",
    "load_material_descs",
    "MaterialTable",
    "make_light",
]
