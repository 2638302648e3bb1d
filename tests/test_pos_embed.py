"""2-D sincos pos-embed parity vs reference pos_embed.py."""

import numpy as np
import pytest

from ref_shim import _load_as
from rs_ov.nn.pos_embed import get_2d_sincos_pos_embed


@pytest.mark.parametrize("dim,gs,cls", [(64, 4, False), (128, 7, True),
                                        (256, 14, True)])
def test_sincos_matches_reference(dim, gs, cls):
    ref = _load_as("ref_pos_embed_t", "/root/reference/open_clip/pos_embed.py")
    got = get_2d_sincos_pos_embed(dim, gs, cls)
    expect = ref.get_2d_sincos_pos_embed(dim, gs, cls_token=cls)
    np.testing.assert_allclose(got, expect, atol=1e-6)
    if cls:
        assert (got[0] == 0).all()
