"""Differentiable geometry ops (pure JAX + Pallas TPU kernels).

The reference's four native CUDA extensions map here:
  cam_bp.CameraBackProjection    -> camera_bp.camera_backproject
  cam_bp.SphericalBackProjection -> spherical_bp.spherical_backproject
  calc_prob.CalcStopProb         -> stop_prob.stop_probability
  nndistance (Chamfer)           -> chamfer.nndistance*
plus toolbox/spherical_proj.py   -> sph.py + render_sph.py
and util/util_voxel.py           -> voxel.py
"""

from .sph import gen_sph_grid, sph_pad, sph_pad_numpy
from .grid_sample import grid_sample_3d
from .stop_prob import stop_probability
from .render_sph import render_spherical
from .camera_bp import (
    camera_backproject,
    camera_backproject_shifted,
    get_surface_mask,
    shift_tdf,
    FL_MARRNET,
    FL_GENRE,
    CAM_DIST,
)
from .spherical_bp import spherical_backproject, backproject_spherical_masked
from .chamfer import nndistance, nndistance_w_idx, nndistance_score
from .reproj import reprojection_loss
from . import coords, voxel

__all__ = [
    "gen_sph_grid", "sph_pad", "sph_pad_numpy", "grid_sample_3d",
    "stop_probability", "render_spherical", "camera_backproject",
    "camera_backproject_shifted", "shift_tdf", "FL_MARRNET", "FL_GENRE",
    "CAM_DIST", "spherical_backproject", "backproject_spherical_masked",
    "nndistance", "nndistance_w_idx", "nndistance_score", "coords", "voxel",
    "get_surface_mask", "reprojection_loss",
]
