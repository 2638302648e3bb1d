"""Compatibility shim: ``import gem; gem.create_gem_model(...)``
(the reference's gem package surface, reference gem/gem.py:91-123)."""

from rs_ov.gem_api import (  # noqa: F401
    GEMWrapper,
    create_gem_model,
    get_gem_img_transform,
    visualize,
)
from rs_ov.factory import get_tokenizer  # noqa: F401
