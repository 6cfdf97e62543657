from .mesh import make_mesh, make_2d_mesh
from .shardings import (
    bilstm_param_spec,
    make_sharded_train_step,
    make_sharded_predict,
)
from .aggregation import sharded_position_counts
