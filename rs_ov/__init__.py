"""rs_ov — TPU-native open-vocabulary remote-sensing segmentation framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the reference
``UserNameUnavailableIsUnavailable/CLIP-Decontamination`` repo (training-free CLIP feature
decontamination + SimFeatUp upsampling + sliding-window open-vocab segmentation
over remote-sensing benchmarks).

Layout (see SURVEY.md §7):
  core/      arch configs, param pytrees, precision policy, checkpoint IO, mesh
  text/      BPE tokenizer, text transformer, prompt-ensemble classifier
  nn/        vision transformer + the custom self-self attention mode registry
  kernels/   Pallas TPU kernels (fused self-self attention, adaptive conv) + XLA refs
  decontam/  training-free decontamination modules (outlier, similarity, SOM, CTD, ...)
  upsample/  SimFeatUp / JBU guided feature upsampling
  pipeline/  sliding-window tiler + Segmentor / SegmentorEx API
  data/      dataset registry + loaders + converters
  evalsuite/ config system, IoU metrics, eval runner
  parallel/  device-mesh sharding (data/tensor parallel inference + training)
  train/     contrastive losses (CLIP / SigLIP) + sharded train step
"""

__version__ = "0.1.0"

from rs_ov.core.config import (  # noqa: F401
    CLIPConfig,
    TextConfig,
    VisionConfig,
    get_model_config,
    list_models,
)
