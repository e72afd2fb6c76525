from multimodal_tpu.losses.clip_loss import (
    clip_loss,
    clip_loss_sampled,
    contrastive_logits,
    cross_entropy,
    gather_features,
)
from multimodal_tpu.losses.cloob_loss import cloob_loss, hopfield_retrieval, infoloob_loss
from multimodal_tpu.losses.align_loss import align_clip_loss
from multimodal_tpu.losses.vclip_loss import vclip_loss
from multimodal_tpu.losses.global_contrastive import chunked_clip_loss, ring_clip_loss
from multimodal_tpu.losses.siglip_loss import siglip_loss
