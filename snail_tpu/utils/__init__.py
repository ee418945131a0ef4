from .frame_counter import FrameCounter
from .image import compare_img, save_image, load_image
from .stats import TreeStats

__all__ = ["FrameCounter", "compare_img", "save_image", "load_image", "TreeStats"]
