from .mcubes import marching_cubes
from .visualizer import Visualizer, save_iso_obj, to_obj_str

__all__ = ["marching_cubes", "Visualizer", "save_iso_obj", "to_obj_str"]
