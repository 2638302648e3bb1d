"""Image preprocessing (the SegDataPreProcessor contract).

The reference normalises with mean [122.771, 116.746, 104.094] /
std [68.501, 66.632, 70.323] after BGR->RGB (reference segmentor.py:64-67).
Images here load as RGB, so only the normalisation applies.
"""

from __future__ import annotations

import numpy as np

__all__ = ["preprocess_image", "load_image", "load_annotation",
           "PREPROC_MEAN", "PREPROC_STD"]

# SegDataPreProcessor constants (reference segmentor.py:64-67), RGB order.
# Defined here (not in pipeline.segmentor, which re-exports them) so that
# importing rs_ov.data never pulls in jax — CPU-only tools (converters,
# metric merge) must work with the TPU tunnel down.
PREPROC_MEAN = np.array([122.771, 116.746, 104.094], np.float32)
PREPROC_STD = np.array([68.501, 66.632, 70.323], np.float32)


def preprocess_image(img_rgb: np.ndarray) -> np.ndarray:
    """HWC uint8/float RGB -> CHW float32 normalised (native OpenMP path when
    the C++ helper is built, numpy otherwise — rs_ov/native)."""
    from rs_ov import native

    return native.normalize_hwc_to_chw(img_rgb, PREPROC_MEAN, PREPROC_STD)


def load_image(path: str) -> np.ndarray:
    """Decoded [H, W, 3] uint8 RGB — native libpng/libjpeg decoder when the
    C++ helper is built (rs_ov/native/decode.cpp), PIL otherwise (and for
    anything the native path refuses: 16-bit PNGs, exotic color types)."""
    from rs_ov import native

    with open(path, "rb") as f:
        data = f.read()
    rgb = native.decode_rgb(data)
    if rgb is not None:
        return rgb
    import io

    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def load_annotation(path: str, reduce_zero_label: bool = False,
                    ignore_index: int = 255) -> np.ndarray:
    """Load a label map with mmseg's reduce_zero_label semantics."""
    from rs_ov import native

    with open(path, "rb") as f:
        data = f.read()
    label = native.decode_gray(data)
    if label is not None:
        label = label.astype(np.int64)
    else:
        import io

        from PIL import Image
        label = np.asarray(Image.open(io.BytesIO(data))).astype(np.int64)
    if label.ndim == 3:
        label = label[..., 0]
    if reduce_zero_label:
        label = label.copy()
        label[label == 0] = ignore_index
        label = label - 1
        label[label == ignore_index - 1] = ignore_index
    return label
