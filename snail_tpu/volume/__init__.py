"""Volume rendering subsystem — rebuild of the reference's DICOM viewer
stack (src/vtree.{h,cpp}, src/volume_data.*, src/dicom_viewer.cpp,
src/vrender_opengl.cpp)."""

from .data import VolumeData, load_dicom_dir, load_dicom_file, load_raw
from .vtree import VTree, build_vtree, render_volume

__all__ = [
    "VolumeData", "load_dicom_dir", "load_dicom_file", "load_raw",
    "VTree", "build_vtree", "render_volume",
]
