#!/usr/bin/env python
"""Day-one real-weights runbook REHEARSAL.

The zero-egress image has no real CLIP/SimFeatUp checkpoints, so the
runbook (BASELINE.md: parity_check --checkpoint, then eval with
--checkpoint/--upsampler-checkpoint) has never executed its checkpoint
branches end-to-end. This tool mechanically rehearses it: generate a
FULL-SIZE reference-named random checkpoint from the reference's own
torch modules (visual.* / text tower / logit_scale, plus an
'upsampler.'-prefixed SimFeatUp ckpt — the k[10:] strip contract,
reference segmentor.py:281-283), then run the real commands against it.
Catches naming/plumbing rot that strict=False loads would hide, without
claiming anything about accuracy (weights are random).

    python tools/runbook_rehearsal.py [--skip-eval]

Writes benchmarks/runbook_rehearsal.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def make_fake_checkpoints(out_dir: str) -> tuple[str, str]:
    import math

    import torch

    from ref_shim import load_reference_module, load_reference_transformer

    tmod = load_reference_transformer()
    ups = load_reference_module("upsamplers")

    torch.manual_seed(0)
    vit = tmod.VisionTransformer(image_size=224, patch_size=16, width=768,
                                 layers=12, heads=12, mlp_ratio=4.0,
                                 output_dim=512)
    text = tmod.TextTransformer(context_length=77, vocab_size=49408,
                                width=512, heads=8, layers=12, output_dim=512)
    with torch.no_grad():
        for m in (vit, text):
            for p in m.parameters():
                p.add_(torch.randn_like(p) * 0.01)
    sd = {f"visual.{k}": v for k, v in vit.state_dict().items()}
    sd.update(text.state_dict())
    sd["logit_scale"] = torch.tensor(math.log(1.0 / 0.07))
    clip_path = os.path.join(out_dir, "ViT-B-16_rehearsal.pt")
    torch.save(sd, clip_path)

    torch.manual_seed(1)
    jbu = ups.JBUOne(512)
    with torch.no_grad():
        for p in jbu.parameters():
            p.add_(torch.randn_like(p) * 0.01)
    jbu_path = os.path.join(out_dir, "jbu_one_rehearsal.ckpt")
    # the reference checkpoint layout: {'state_dict': {'upsampler.<k>': v}}
    torch.save({"state_dict": {f"upsampler.{k}": v
                               for k, v in jbu.state_dict().items()}}, jbu_path)
    return clip_path, jbu_path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-eval", action="store_true",
                    help="skip the (TPU) eval.py leg; parity leg only")
    ap.add_argument("--out-dir", default="/tmp/rsov_rehearsal")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    result: dict = {"what": ("day-one runbook rehearsal on a full-size "
                             "reference-named RANDOM checkpoint — plumbing "
                             "evidence, not accuracy")}

    t0 = time.time()
    clip_path, jbu_path = make_fake_checkpoints(args.out_dir)
    result["checkpoint_bytes"] = os.path.getsize(clip_path)
    print(f"[rehearsal] wrote {clip_path} ({result['checkpoint_bytes']} B) "
          f"+ {jbu_path}", flush=True)

    # leg 1: the parity harness exactly as BASELINE.md prescribes
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--checkpoint", clip_path, "--jbu-checkpoint", jbu_path],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    tail = p.stdout.strip().splitlines()
    summary = next((ln for ln in reversed(tail) if ln.startswith("{")), "{}")
    result["parity"] = json.loads(summary)
    result["parity"]["rc"] = p.returncode
    print(f"[rehearsal] parity_check rc={p.returncode} "
          f"failed={result['parity'].get('failed')}", flush=True)

    # leg 2: the eval CLI with both checkpoint flags over a synthetic config
    if not args.skip_eval:
        env = dict(os.environ,
                   RS_OV_DATA_ROOT=os.path.join(REPO, "data_synth"))
        p2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "eval.py"),
             "--config", os.path.join(REPO, "configs", "cfg_loveda.py"),
             "--checkpoint", clip_path,
             "--upsampler-checkpoint", jbu_path,
             "--work-dir", os.path.join(args.out_dir, "eval")],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
        result["eval_rc"] = p2.returncode
        mline = [ln for ln in p2.stdout.splitlines() if "mIoU" in ln]
        result["eval_tail"] = mline[-1].strip() if mline else \
            p2.stdout.strip().splitlines()[-1:]
        print(f"[rehearsal] eval rc={p2.returncode} {result['eval_tail']}",
              flush=True)

    result["elapsed_sec"] = round(time.time() - t0, 1)
    ok = result["parity"]["rc"] == 0 and not result["parity"].get("failed") \
        and result.get("eval_rc", 0) == 0
    result["ok"] = ok
    out = os.path.join(REPO, "benchmarks", "runbook_rehearsal.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[rehearsal] {'OK' if ok else 'FAILED'}; wrote {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
