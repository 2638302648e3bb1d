#!/usr/bin/env python
"""Loop eval over all dataset configs (reference eval_all.py:2-27).

Runs in-process (one segmentor rebuild per config) instead of os.system —
failures are caught and reported, not silently ignored."""

import argparse
import json
import traceback

CONFIGS = [
    # rs semantic segmentation
    "./configs/cfg_openearthmap.py",
    "./configs/cfg_loveda.py",
    "./configs/cfg_isaid.py",
    "./configs/cfg_potsdam.py",
    "./configs/cfg_vaihingen.py",
    "./configs/cfg_uavid.py",
    "./configs/cfg_udd5.py",
    "./configs/cfg_vdd.py",
    # rs single-class
    "./configs/cfg_whu_building.py",
    "./configs/cfg_whu_sat_II.py",
    "./configs/cfg_inria.py",
    "./configs/cfg_xbd.py",
    "./configs/cfg_chn6-cug.py",
    "./configs/cfg_deepglobe_road.py",
    "./configs/cfg_massachusetts_road.py",
    "./configs/cfg_spacenet_road.py",
    "./configs/cfg_wbs-si.py",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work-dir", default="work_dirs/all")
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--upsampler-checkpoint", default=None,
                        help="SimFeatUp checkpoint path (see eval.py)")
    parser.add_argument("--jbu-stages", type=int, default=None,
                        help="opt-in reduced-stage JBU fast mode (see eval.py; "
                             "when --checkpoint is passed without this flag, "
                             "num_stages is pinned to 4 = reference parity)")
    parser.add_argument("--batch-images", type=int, default=1,
                        help="cross-image tile batching (see eval.py; "
                             "default 1 on a single chip, raise on a mesh)")
    parser.add_argument("--json-out", default=None,
                        help="also write the summary dict to this file")
    args = parser.parse_args()

    from eval import build_model_overrides
    from rs_ov.evalsuite.runner import run_eval

    # checkpoint without --jbu-stages pins num_stages=4 (reference parity
    # semantics) — see eval.build_model_overrides
    overrides = build_model_overrides(args.checkpoint, args.upsampler_checkpoint,
                                      args.jbu_stages)
    summary = {}
    for config in CONFIGS:
        print(f"Running {config}", flush=True)
        try:
            r = run_eval(config, work_dir=args.work_dir,
                         max_samples=args.max_samples, model_overrides=overrides,
                         batch_images=args.batch_images)
            keys = ("aAcc", "mIoU", "mAcc", "num_images",
                    "tiles512_per_sec", "tiles512_per_sec_steady",
                    "img_per_sec_sustained", "tiles512_per_sec_sustained")
            summary[config] = {k: r[k] for k in keys if k in r}
        except FileNotFoundError as e:
            summary[config] = {"error": f"dataset missing: {e}"}
        except Exception:
            summary[config] = {"error": traceback.format_exc(limit=3)}
    out = json.dumps(summary, indent=2)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
