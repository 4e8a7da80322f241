from fateavatar_tpu.completion.eg3d.networks import (
    EG3DConfig, eg3d_random_params, mapping_network, synthesis, render_full,
)
from fateavatar_tpu.completion.eg3d.pti import (
    PTIConfig, compute_w_stats, project_w, pti_finetune,
)
from fateavatar_tpu.completion.eg3d.convert import load_eg3d_from_torch
from fateavatar_tpu.completion.eg3d.pkl_ingest import load_eg3d_from_pkl

__all__ = [
    "EG3DConfig", "eg3d_random_params", "mapping_network", "synthesis",
    "render_full", "PTIConfig", "compute_w_stats", "project_w",
    "pti_finetune", "load_eg3d_from_torch", "load_eg3d_from_pkl",
]
