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
from multimodal_tpu.models.captioner import (
    ClipCaptionModel,
    GPT2,
    GPT2Config,
    TransformerMapper,
    load_hf_gpt2,
)
from multimodal_tpu.models.checkpoint_interop import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_pretrained,
    resize_pos_embed,
)
