#!/usr/bin/env python
"""Minimal library-API example (reference demo.py:28-52): build a Segmentor,
predict one 448x448 image, save a colorized figure."""

import numpy as np

from rs_ov.data.palette import colorize_mask
from rs_ov.data.transforms import preprocess_image
from rs_ov.pipeline.segmentor import Segmentor


def main():
    model = Segmentor(
        clip_type="CLIP",
        vit_type="ViT-B/16",
        model_type="SegEarth",
        name_path="./configs/cls_potsdam.txt",
        apply_sim_feat_up=True,
        cls_token_lambda=-0.3,
        prob_thd=0.1,
        bg_idx=5,
        # checkpoint_path='weights/ViT-B-16.pt',  # supply real weights here
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(448, 448, 3), dtype=np.uint8)
    inputs = preprocess_image(img)[None]  # [1, 3, 448, 448]

    result = model.predict(inputs)[0]
    seg_pred = np.asarray(result["pred_sem_seg"])[0]
    print("prediction:", seg_pred.shape, "classes present:", np.unique(seg_pred))
    colorize_mask(seg_pred, model.num_classes, model.bg_idx, "demo_pred.png")
    print("saved demo_pred.png")


if __name__ == "__main__":
    main()
