from medical_image_classification_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
)
from medical_image_classification_tpu.parallel.sharding import (
    param_shardings,
    state_shardings,
    shard_state,
)
from medical_image_classification_tpu.parallel.sequence_parallel import (
    ssd_sequence_parallel,
    selective_scan_sequence_parallel,
)
