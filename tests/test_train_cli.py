"""train.py CLI: sharded fine-tuning driver (the reference has none)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli  # noqa: E402


def test_synthetic_dp_tp_smoke(tmp_path):
    train_cli.main(["--model", "ViT-B-32", "--tiny", "--synthetic",
                    "--steps", "3", "--batch-size", "8", "--mesh", "4,2",
                    "--log-every", "1", "--precision", "fp32",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "ck" / "step_3.npz")


def test_resume_continues_from_checkpoint(tmp_path, capsys):
    ck = str(tmp_path / "ck")
    train_cli.main(["--model", "ViT-B-32", "--tiny", "--synthetic",
                    "--steps", "2", "--batch-size", "4", "--ckpt-dir", ck, "--mesh", "2,1",
                    "--precision", "fp32", "--log-every", "1"])
    train_cli.main(["--model", "ViT-B-32", "--tiny", "--synthetic",
                    "--steps", "4", "--batch-size", "4", "--ckpt-dir", ck, "--mesh", "2,1",
                    "--precision", "fp32", "--log-every", "1"])
    out = capsys.readouterr().out
    assert "resumed from" in out and "step_2.npz" in out
    assert os.path.exists(os.path.join(ck, "step_4.npz"))


def test_sidecar_data_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(40, 50, 3) * 255).astype("uint8")).save(
            tmp_path / f"im{i}.png")
        (tmp_path / f"im{i}.txt").write_text(f"an aerial image number {i}")
    params = train_cli.main(["--model", "ViT-B-32", "--tiny", "--data",
                             str(tmp_path), "--steps", "2", "--batch-size", "2", "--mesh", "1,1",
                             "--precision", "fp32", "--log-every", "1"])
    assert "visual" in params


def test_manifest_formats(tmp_path):
    (tmp_path / "m.tsv").write_text("a.png\tcap one\nb.png\tcap two\n")
    pairs = train_cli._read_manifest(str(tmp_path / "m.tsv"))
    assert pairs == [("a.png", "cap one"), ("b.png", "cap two")]
    (tmp_path / "m.jsonl").write_text(
        json.dumps({"image": "x.png", "caption": "c"}) + "\n")
    assert train_cli._read_manifest(str(tmp_path / "m.jsonl")) == [("x.png", "c")]


def test_requires_data_or_synthetic():
    with pytest.raises(SystemExit):
        train_cli.main(["--steps", "1"])


def test_accum_freq_smoke(tmp_path):
    """--accum-freq 2: global batch split into 2 micro-batches per step."""
    train_cli.main(["--model", "ViT-B-32", "--tiny", "--synthetic",
                    "--steps", "2", "--batch-size", "8", "--accum-freq", "2",
                    "--mesh", "4,1", "--log-every", "1",
                    "--precision", "fp32",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "ck" / "step_2.npz")


def test_grad_clip_norm_smoke(tmp_path):
    train_cli.main(["--model", "ViT-B-32", "--tiny", "--synthetic",
                    "--steps", "2", "--batch-size", "4", "--mesh", "2,1",
                    "--grad-clip-norm", "1.0", "--log-every", "1",
                    "--precision", "fp32",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "ck" / "step_2.npz")


import train_blip as train_blip_cli  # noqa: E402


@pytest.mark.parametrize("task", ["retrieval", "pretrain", "caption",
                                  "vqa", "nlvr"])
def test_blip_tasks_synthetic_smoke(task, tmp_path, capsys):
    """train_blip.py: every BLIP objective trains on the virtual mesh
    (reference BLIP train_{retrieval,caption,vqa,nlvr}.py / pretrain.py)."""
    train_blip_cli.main(["--task", task, "--tiny", "--synthetic",
                         "--steps", "2", "--batch-size", "8",
                         "--mesh", "2,1", "--precision", "fp32",
                         "--log-every", "1",
                         "--ckpt-dir", str(tmp_path / "ck"),
                         "--ckpt-every", "2"])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["step"] == 2
    for k, v in rec.items():
        if k.startswith("loss"):
            assert np.isfinite(v) and v > 0
    assert os.path.exists(tmp_path / "ck" / "step_0000002.npz")


def test_blip_caption_pairs_manifest(tmp_path):
    """(image, caption) manifest path + WordPiece vocab through the caption
    objective."""
    from PIL import Image

    rng = np.random.RandomState(0)
    lines = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        Image.fromarray((rng.rand(40, 50, 3) * 255).astype("uint8")).save(p)
        lines.append(f"{p}\tan aerial image number {i}")
    (tmp_path / "pairs.tsv").write_text("\n".join(lines))
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "an", "aerial", "image",
             "number", "0", "1"] + [f"w{i}" for i in range(52)]
    (tmp_path / "vocab.txt").write_text("\n".join(words))
    last = train_blip_cli.main(
        ["--task", "caption", "--tiny", "--data",
         str(tmp_path / "pairs.tsv"), "--vocab", str(tmp_path / "vocab.txt"),
         "--steps", "2", "--batch-size", "2", "--mesh", "1,1",
         "--precision", "fp32", "--log-every", "1"])
    assert np.isfinite(last["loss"])


def test_randaugment_ops_and_cli(tmp_path):
    """RandomAugment (reference BLIP/transform/randaugment.py surface):
    every op produces a valid uint8 image; PIL-oracle checks for the ops
    the reference docstrings define as 'same output as PIL.ImageOps.*';
    --augment path trains."""
    from PIL import Image, ImageOps

    from rs_ov.data.randaugment import RandomAugment

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 40, 3)).astype(np.uint8)
    ra = RandomAugment(2, 5, seed=0)
    for name in ("Identity", "AutoContrast", "Equalize", "Rotate",
                 "Solarize", "Color", "Contrast", "Brightness", "Sharpness",
                 "ShearX", "ShearY", "TranslateX", "TranslateY", "Posterize"):
        from rs_ov.data.randaugment import _level_args
        out = ra._apply(Image.fromarray(img), name, _level_args(5.0)[name])
        arr = np.asarray(out)
        assert arr.shape == img.shape and arr.dtype == np.uint8, name

    # PIL-oracle: the deterministic ops must BE the PIL ops
    pil = Image.fromarray(img)
    np.testing.assert_array_equal(
        np.asarray(ra._apply(pil, "AutoContrast", ())),
        np.asarray(ImageOps.autocontrast(pil)))
    np.testing.assert_array_equal(
        np.asarray(ra._apply(pil, "Equalize", ())),
        np.asarray(ImageOps.equalize(pil)))

    # deterministic under a fixed seed; N=2 ops applied
    a = RandomAugment(2, 5, seed=3)(img)
    b = RandomAugment(2, 5, seed=3)(img)
    np.testing.assert_array_equal(a, b)

    # --augment through the caption CLI
    lines = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 256, (40, 50, 3)).astype("uint8")).save(p)
        lines.append(f"{p}\tan aerial image number {i}")
    (tmp_path / "pairs.tsv").write_text("\n".join(lines))
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "an", "aerial", "image",
             "number", "0", "1"] + [f"w{i}" for i in range(52)]
    (tmp_path / "vocab.txt").write_text("\n".join(words))
    last = train_blip_cli.main(
        ["--task", "caption", "--tiny", "--data",
         str(tmp_path / "pairs.tsv"), "--vocab", str(tmp_path / "vocab.txt"),
         "--augment", "--steps", "2", "--batch-size", "2", "--mesh", "1,1",
         "--precision", "fp32", "--log-every", "1"])
    assert np.isfinite(last["loss"])


def test_retrieval_evaluate_mode(capsys):
    """train_blip.py --evaluate: the reference train_retrieval.py --evaluate
    flow (evaluation() -> itm_eval() -> metrics JSON) on synthetic pairs."""
    m = train_blip_cli.main(
        ["--task", "retrieval", "--tiny", "--synthetic", "--evaluate",
         "--eval-samples", "6", "--k-test", "3", "--mesh", "1,1",
         "--context-length", "8"])
    for k in ("txt_r1", "txt_r5", "txt_r10", "img_r1", "img_r5", "img_r10",
              "r_mean"):
        assert 0.0 <= m[k] <= 100.0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rec) >= {"txt_r_mean", "img_r_mean", "r_mean"}


def test_evaluate_rejected_for_non_retrieval():
    with pytest.raises(SystemExit):
        train_blip_cli.main(["--task", "caption", "--tiny", "--synthetic",
                             "--evaluate"])


def test_blip_predict_cli(tmp_path, capsys):
    """tools/blip_predict.py: the reference BLIP/predict.py three-task
    surface (caption string / answer string / ITM+ITC sentence)."""
    from PIL import Image

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import blip_predict

    rng = np.random.RandomState(0)
    img = tmp_path / "x.png"
    Image.fromarray(rng.randint(0, 256, (48, 40, 3)).astype("uint8")).save(img)

    out = blip_predict.main(["--task", "image_captioning", "--image",
                             str(img), "--tiny", "--random-init"])
    assert out.startswith("Caption: ")
    out = blip_predict.main(["--task", "visual_question_answering",
                             "--image", str(img), "--question", "w3 w4?",
                             "--tiny", "--random-init"])
    assert out.startswith("Answer: ")
    out = blip_predict.main(["--task", "image_text_matching", "--image",
                             str(img), "--caption", "w5 w6", "--tiny",
                             "--random-init"])
    assert "matched with a probability of" in out
    assert "cosine similarity of" in out
