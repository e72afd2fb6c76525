from multimodal_tpu.ops.bessel import log_iv, bessel_iv_ratio, vmf_log_normalizer
from multimodal_tpu.ops.ring_attention import ring_attention
from multimodal_tpu.ops.sphere import (
    householder_rotation,
    sample_uniform_sphere,
    log_sphere_surface_area,
)
