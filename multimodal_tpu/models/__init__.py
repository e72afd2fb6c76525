from multimodal_tpu.models.config import (
    CLIPConfig,
    TextConfig,
    VariationalConfig,
    VisionConfig,
    add_model_config,
    get_model_config,
    list_models,
)
from multimodal_tpu.models.clip import CLIP, VariationalCLIP
from multimodal_tpu.models.factory import create_model, example_inputs, init_params, param_count
