from .encoding import poc_fre, poc_freqs, poc_dim
from .activation import raw2alpha, activate_density
from .rays import (get_rays, ndc_rays, get_rays_of_a_view, ray_aabb,
                   sample_pts_on_rays, rays_hit_bbox, max_n_steps, RaySamples)
from .marching import alpha2weights, composite, distortion_loss
from .grid import (bake_multiscale, grid_interp, mult_dist_interp,
                   resize_trilinear,
                   total_variation, total_variation_grad, pad_to_mult4)
from .rotations import (rodrigues, special_procrustes, rotmat_to_rotvec,
                        geodesic_angle)
from .knn import knn, nn1, chamfer, batch_chamfer
from . import nn
