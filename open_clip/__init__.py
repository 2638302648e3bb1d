"""open_clip compatibility facade over rs_ov.

The reference's public API contract includes ``open_clip.create_model`` /
``create_model_and_transforms`` / ``get_tokenizer`` / ``tokenizer.tokenize``
(BASELINE.json; reference open_clip/factory.py). This package re-exports the
rs_ov equivalents under the familiar names so reference user code imports
unchanged.
"""

from rs_ov.factory import (  # noqa: F401
    CLIPModel,
    create_loss,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_tokenizer,
    image_transform,
    image_transform_v2,
    PreprocessCfg,
)
from rs_ov.hub import generate_readme, push_to_hf_hub  # noqa: F401
from rs_ov.core.config import get_model_config, list_models  # noqa: F401
from rs_ov.pretrained import (  # noqa: F401
    get_pretrained_cfg,
    get_pretrained_url,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from rs_ov.text import tokenizer  # noqa: F401
from rs_ov.text.zero_shot_metadata import (  # noqa: F401
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    SIMPLE_IMAGENET_TEMPLATES,
)
from rs_ov.text.tokenizer import SimpleTokenizer, tokenize  # noqa: F401

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)

# version of the open_clip surface this facade tracks (reference version.py)
__version__ = "2.24.0"
