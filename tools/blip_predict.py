#!/usr/bin/env python
"""Single-image BLIP multitask predictor (reference BLIP/predict.py).

The reference wraps three checkpoints behind a cog.Predictor: captioning
(384px blip_decoder), VQA (480px blip_vqa, 'generate' inference) and
image-text matching (384px blip_itm; ITM probability + ITC cosine). Same
tasks and output strings here, torch/cog-free:

    python tools/blip_predict.py --task image_captioning \\
        --image photo.jpg --pretrained model_base_caption.pth --vocab vocab.txt
    python tools/blip_predict.py --task visual_question_answering \\
        --image photo.jpg --question "where is the dog?" --pretrained ...
    python tools/blip_predict.py --task image_text_matching \\
        --image photo.jpg --caption "a dog on grass" --pretrained ...

``--tiny --random-init`` runs the full flow on random weights at 32px (CI
smoke; no checkpoints exist in this image).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TASKS = ("image_captioning", "visual_question_answering",
         "image_text_matching")


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=TASKS, default="image_captioning")
    ap.add_argument("--image", required=True)
    ap.add_argument("--question", default=None)
    ap.add_argument("--caption", default=None)
    ap.add_argument("--pretrained", default=None,
                    help="BLIP .pth checkpoint for the chosen task")
    ap.add_argument("--vocab", default=None, help="WordPiece vocab.txt")
    ap.add_argument("--vit", choices=("base", "large"), default="base")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--random-init", action="store_true",
                    help="skip checkpoint load (smoke)")
    return ap.parse_args(argv)


def _load_rgb(path: str, size: int) -> np.ndarray:
    """Reference predict.py load_image: squash-resize to size², CLIP
    mean/std normalise, [1, 3, S, S]."""
    import jax.numpy as jnp

    from rs_ov.data.transforms import load_image
    from rs_ov.utils.resize import resize_bicubic

    x = np.asarray(load_image(path), np.float32) / 255.0
    x = np.asarray(resize_bicubic(jnp.asarray(x.transpose(2, 0, 1)),
                                  (size, size)))
    mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)
    return ((x - mean[:, None, None]) / std[:, None, None])[None]


def main(argv=None) -> str:
    args = parse_args(argv)
    if args.task == "visual_question_answering" and not args.question:
        sys.exit("Please type a question for visual question answering task.")
    if args.task == "image_text_matching" and not args.caption:
        sys.exit("Please type a caption for image text matching task.")
    if not args.random_init and not args.pretrained:
        sys.exit("pass --pretrained <ckpt.pth> (or --random-init for smoke)")

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rs_ov.nn.bert import BertConfig
    from rs_ov.nn.blip import BlipConfig, blip_itm_score
    from rs_ov.nn.blip_vit import BlipVisionConfig
    from rs_ov.text.wordpiece import WordPieceTokenizer

    # reference predict.py:64 — 480px for VQA, 384px elsewhere
    size = 32 if args.tiny else (
        480 if args.task == "visual_question_answering" else 384)
    if args.tiny:
        cfg = BlipConfig(
            vision=BlipVisionConfig(image_size=32, patch_size=16, width=64,
                                    layers=2, heads=2),
            text=BertConfig(vocab_size=64, hidden_size=64, num_layers=2,
                            num_heads=2, intermediate_size=128,
                            max_position_embeddings=40),
            embed_dim=32)
    else:
        cfg = (BlipConfig.large if args.vit == "large" else BlipConfig.base)(
            image_size=size)

    if args.vocab:
        tok = WordPieceTokenizer(args.vocab)
    elif args.tiny:
        import tempfile

        words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of"]
        words += [f"w{i}" for i in range(cfg.text.vocab_size - 2 - len(words))]
        f = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
        f.write("\n".join(words))
        f.close()
        tok = WordPieceTokenizer(f.name)
    else:
        sys.exit("pass --vocab vocab.txt (bert-base-uncased vocabulary)")

    key = jax.random.PRNGKey(0)
    img = jnp.asarray(_load_rgb(args.image, size))
    sd = None
    if args.pretrained and not args.random_init:
        from rs_ov.core.checkpoint import load_torch_state_dict

        sd = load_torch_state_dict(args.pretrained)

    if args.task == "image_captioning":
        from rs_ov.nn.blip_lm import (blip_decoder_params_from_state_dict,
                                      generate_captions,
                                      init_blip_decoder_params)

        params = (blip_decoder_params_from_state_dict(sd) if sd is not None
                  else init_blip_decoder_params(key, cfg))
        cap = generate_captions(params, img, cfg, tok, sample=False,
                                num_beams=3, max_length=20, min_length=5)
        out = "Caption: " + cap[0]
    elif args.task == "visual_question_answering":
        from rs_ov.nn.blip_lm import (blip_vqa_params_from_state_dict,
                                      init_blip_vqa_params,
                                      vqa_generate_answers)

        params = (blip_vqa_params_from_state_dict(sd) if sd is not None
                  else init_blip_vqa_params(key, cfg))
        enc = tok([args.question], max_length=35)
        q_ids = enc["input_ids"].astype(np.int32)
        q_ids[:, 0] = tok.enc_token_id
        ans = vqa_generate_answers(params, img, jnp.asarray(q_ids),
                                   jnp.asarray(enc["attention_mask"]), cfg,
                                   tok, num_beams=3, max_length=10)
        out = "Answer: " + ans[0]
    else:
        if sd is not None:
            from rs_ov.nn.blip import blip_params_from_state_dict

            params = blip_params_from_state_dict(sd)
        else:
            from rs_ov.train.blip_retrieval import init_blip_retrieval_state

            params = init_blip_retrieval_state(key, cfg,
                                               queue_size=8)["params"]
        enc = tok([args.caption], max_length=35)
        ids = enc["input_ids"].astype(np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        # the reference ITM head consumes the RAW tokenized caption — [CLS]
        # at position 0, no [ENC] substitution (blip_itm.py:41-59; only the
        # retrieval trainer swaps in [ENC], blip_retrieval.py:118)
        itm = blip_itm_score(params, img, jnp.asarray(ids),
                             jnp.asarray(mask), cfg, match_head="itm")
        p = float(jax.nn.softmax(itm.astype(jnp.float32), axis=1)[0, 1])
        itc = float(blip_itm_score(params, img, jnp.asarray(ids),
                                   jnp.asarray(mask), cfg,
                                   match_head="itc")[0, 0])
        out = (f"The image and text is matched with a probability of "
               f"{p:.4f}.\nThe image feature and text feature has a cosine "
               f"similarity of {itc:.4f}.")
    print(out)
    return out


if __name__ == "__main__":
    main()
