from multimodal_tpu.research.vmf_mixture import (
    VMFMixtureEM,
    fit_von_mises_fisher_mixture,
    solve_concentration,
)
from multimodal_tpu.research.gmm_fit import gmm_model_selection
from multimodal_tpu.research.projection import pca_projection, project_embeddings
