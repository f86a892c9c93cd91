import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from apnerf.kernels.knn_cells_pallas import knn_radius_pallas

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
p = jnp.asarray(rng.normal(size=(4000, 3)).astype(np.float32))
d2, idx = knn_radius_pallas(q, p, k=8, radius2=0.05)
print("ok", np.asarray(d2).shape, float(np.asarray(d2)[0, 0]))
