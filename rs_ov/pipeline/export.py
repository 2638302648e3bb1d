"""AOT export of the fused per-geometry inference program (serving path).

The segmentor compiles ONE XLA program per image geometry (pipeline/
segmentor.py:_build_image_fn). For serving, `export_predict` serializes
that exact program — weights, text-query features and upsampler params
embedded as constants — into a single self-contained artifact via
jax.export (StableHLO); `load_predict` rebuilds a callable without
retracing or re-reading checkpoints. Cold start becomes deserialization +
device compile of a canned program instead of Python tracing of the whole
pipeline.

The reference has no serving/export story (its deployment unit is the
torch module tree + eval.py); this is the TPU-native production analog.
The artifact is platform-tagged by jax.export: export on the platform you
serve on (a CPU-exported program will not load onto TPU and vice versa —
the loader surfaces jax's own error in that case).

    seg = SegmentorEx(...)
    export_predict(seg, (512, 512), "model_512.rsov")
    predict = load_predict("model_512.rsov")
    pred = predict(img_uint8_hw3)          # [H, W] labels, same contract
"""

from __future__ import annotations

import json
import os
import struct

import jax
import jax.numpy as jnp

__all__ = ["export_predict", "load_predict"]

_MAGIC = b"RSOVEXP1"


def export_predict(seg, image_hw: tuple[int, int], path: str,
                   ori_shape: tuple[int, int] | None = None,
                   raw: bool = True) -> dict:
    """Serialize the fused predict program for one image geometry.

    seg: a constructed SegmentorEx/Segmentor. image_hw: input geometry the
    program is specialized to. raw=True exports the production uint8
    [H, W, 3] contract (device-fused normalisation); raw=False the
    [1, 3, H, W] float contract. ori_shape defaults to image_hw (the
    program's output resize target, reference segmentor.py:447-449).
    Returns the written header dict."""
    h, w = image_hw
    ori = tuple(ori_shape) if ori_shape is not None else (h, w)
    fn = seg._build_image_fn(h, w, ori, raw=raw)

    def serve(img):
        return fn(seg.params, seg.upsampler_params, seg.query_features, img)

    if raw:
        spec = jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)
    else:
        spec = jax.ShapeDtypeStruct((1, 3, h, w), jnp.float32)
    exported = jax.export.export(jax.jit(serve))(spec)
    blob = exported.serialize()

    header = {
        "format": "rs_ov.export_predict",
        "image_hw": [h, w], "ori_shape": list(ori), "raw": raw,
        "pred_dtype": str(jnp.dtype(seg.pred_dtype).name)
        if getattr(seg, "pred_dtype", None) is not None else "int32",
        "platforms": list(exported.platforms),
        "num_queries": int(seg.query_features.shape[0]),
    }
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)
    return header


def load_predict(path: str):
    """Rebuild the serving callable from an export_predict artifact.

    Returns fn(img) -> prediction with the exported contract; fn.header
    carries the artifact metadata."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an rs_ov export artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    exported = jax.export.deserialize(blob)

    def fn(img):
        probs, pred = exported.call(jnp.asarray(img))
        return {"probs": probs, "pred_sem_seg": pred}

    fn.header = header
    return fn


def _cli():
    import argparse

    ap = argparse.ArgumentParser(
        description="Export the fused predict program for serving")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512),
                    metavar=("H", "W"))
    ap.add_argument("--name-path", required=True,
                    help="cls_*.txt class vocabulary")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--simfeatup-ckpt", default=None)
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()

    from rs_ov.pipeline.segmentor import SegmentorEx

    seg = SegmentorEx(
        clip_type="CLIP", vit_type="ViT-B/16", model_type="Experimental",
        name_path=args.name_path, ignore_residual=True,
        apply_sim_feat_up=True, global_debias_factor=0.2,
        apply_outlier_suppression=True, outlier_suppression_cfg={"top_k": 30},
        apply_similarity_enhancement=True,
        checkpoint_path=args.checkpoint,
        sim_feat_up_cfg={"model_name": "jbu_one",
                         "model_path": args.simfeatup_ckpt},
    )
    hdr = export_predict(seg, tuple(args.size), args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes): {hdr}")


if __name__ == "__main__":
    _cli()
