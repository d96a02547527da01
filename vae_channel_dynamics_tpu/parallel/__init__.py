from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
)
from .zero import opt_state_shardings, state_shardings, tensor_shardings
