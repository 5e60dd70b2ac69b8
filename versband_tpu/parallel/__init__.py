from versband_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from versband_tpu.parallel.sharding import (
    param_shardings, batch_shardings, replicated, PARAM_RULES,
)
