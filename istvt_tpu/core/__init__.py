from istvt_tpu.core.config import (
    ISTVTConfig,
    TrainConfig,
    DataConfig,
    MeshConfig,
)
from istvt_tpu.core.mesh import make_mesh, data_sharding, replicate
from istvt_tpu.core import tree
