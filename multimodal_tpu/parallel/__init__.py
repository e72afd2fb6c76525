from multimodal_tpu.parallel.mesh import (
    batch_axes,
    create_hybrid_mesh,
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from multimodal_tpu.parallel.ep import (
    EXPERT_AXIS,
    create_ep_mesh,
    ep_state_shardings,
    shard_state_ep,
)
from multimodal_tpu.parallel.compose import (
    fsdp_tp_spec_for_path,
    fsdp_tp_state_shardings,
    shard_state_fsdp_tp,
)
from multimodal_tpu.parallel.fsdp import (
    fsdp_spec_for_leaf,
    fsdp_state_shardings,
    shard_state_fsdp,
)
from multimodal_tpu.parallel.pp import (
    create_pp_mesh,
    from_pipeline_params,
    make_pp_train_step,
    pipeline_blocks,
    pp_state_shardings,
    to_pipeline_params,
)
from multimodal_tpu.parallel.tp import (
    MODEL_AXIS,
    create_tp_mesh,
    shard_state,
    tp_spec_for_path,
    tp_state_shardings,
)
