#!/usr/bin/env python
"""Single-dataset evaluation CLI (same surface as reference eval.py:14-46).

    python eval.py --config configs/cfg_potsdam.py --work-dir work_dirs/potsdam

Framework additions: --checkpoint / --upsampler-checkpoint (no implicit
downloads in this zero-egress environment), --max-samples, --shard R/W for
multi-process data-parallel eval (the dist_test.sh role).
"""

import argparse
import json
import os


def parse_args():
    parser = argparse.ArgumentParser(description="rs_ov open-vocab segmentation eval")
    parser.add_argument("--config", default="./configs/cfg_potsdam.py")
    parser.add_argument("--work-dir", default="./work_logs/")
    parser.add_argument("--show", action="store_true", help="(accepted, unused)")
    parser.add_argument("--show-dir", default="./show-dir/")
    parser.add_argument("--save-seg-dir", default=None,
                        help="directory for per-image colorized masks")
    parser.add_argument("--save-heatmap-dir", default=None,
                        help="directory for per-image confidence heatmaps")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm", "mpi", "jax"],
                        default="none", help="accepted for compat; sharding via --shard")
    parser.add_argument("--local_rank", "--local-rank", type=int, default=0)
    parser.add_argument("--checkpoint", default=None, help="CLIP torch checkpoint path")
    parser.add_argument("--upsampler-checkpoint", default=None,
                        help="SimFeatUp checkpoint path")
    parser.add_argument("--jbu-stages", type=int, default=None,
                        help="opt-in reduced-stage JBU fast mode (default 4 "
                             "= reference semantics; see benchmarks/PERF.md)")
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--batch-images", type=int, default=1,
                        help="fuse N same-shape images into one dispatch "
                             "(cross-image tile batching; exactly per-image "
                             "in fp32, metric-equivalent at bf16 — "
                             "benchmarks/PERF.md round-4). Default 1: the "
                             "interleaved eval-loop A/B has per-image at "
                             "34-35 img/s vs 24-25 batched on ONE chip; "
                             "set to a multiple of the mesh size for "
                             "multi-chip runs, where the union batch's "
                             "even tile sharding dominates")
    parser.add_argument("--shard", default="0/1", help="rank/world for dataset sharding")
    parser.add_argument("--merge", default=None, metavar="DIST_DIR",
                        help="merge per-rank metric states under DIST_DIR "
                             "(rank*/metric_state.npz) into one dataset-level "
                             "result and exit")
    return parser.parse_args()


def build_model_overrides(checkpoint, upsampler_checkpoint, jbu_stages):
    """Resolve CLI checkpoint/stage flags into segmentor overrides.

    Parity pin: when real weights are supplied (--checkpoint /
    --upsampler-checkpoint) and the caller did NOT explicitly request a
    stage count, num_stages is pinned to 4 — strict reference semantics
    (reference simfeatup_dev/upsamplers.py:304-325 is a fixed 4-stage 16x).
    Without this, the BASELINE.md ±0.1 mIoU gate would silently compare the
    certified-but-approximate fast mode (2-stage default) against the 4-stage
    reference. Fast mode on real weights is opt-in: pass --jbu-stages 2/3 or
    set RS_OV_JBU_STAGES (the env override wins inside SegmentorEx and a
    loud warning is printed here).
    """
    overrides = {}
    if checkpoint:
        overrides["checkpoint_path"] = checkpoint
    if upsampler_checkpoint:
        overrides["sim_feat_up_cfg"] = {"model_name": "jbu_one",
                                        "model_path": upsampler_checkpoint}
    if jbu_stages is not None:
        cfg = dict(overrides.get("sim_feat_up_cfg") or {"model_name": "jbu_one"})
        cfg["num_stages"] = jbu_stages
        overrides["sim_feat_up_cfg"] = cfg
    elif checkpoint or upsampler_checkpoint:
        cfg = dict(overrides.get("sim_feat_up_cfg") or {"model_name": "jbu_one"})
        cfg["num_stages"] = 4
        overrides["sim_feat_up_cfg"] = cfg
        env = os.environ.get("RS_OV_JBU_STAGES")
        if env is not None and env != "4":
            import sys

            print(f"WARNING: RS_OV_JBU_STAGES={env} overrides the checkpoint "
                  "parity pin (num_stages=4); this run is NOT a reference-"
                  "semantics parity run", file=sys.stderr, flush=True)
    return overrides


def main():
    args = parse_args()
    if args.merge:
        # merging per-rank confusion matrices is pure host work: never let a
        # wedged TPU tunnel hang it (import of the eval stack can trigger
        # backend init — see rs_ov/core/platform.py)
        from rs_ov.core.platform import pin_cpu

        pin_cpu()
        from rs_ov.evalsuite.runner import merge_eval_results

        results = merge_eval_results(args.merge)
        print(json.dumps({k: results[k] for k in
                          ("aAcc", "mIoU", "mAcc", "num_images", "num_shards")},
                         indent=2))
        return
    save_seg_dir = args.save_seg_dir or os.environ.get("SAVE_SEG_DIR")
    save_heatmap_dir = args.save_heatmap_dir or os.environ.get("SAVE_HEATMAP_DIR")
    rank, world = (int(x) for x in args.shard.split("/"))

    from rs_ov.evalsuite.runner import run_eval

    overrides = build_model_overrides(args.checkpoint, args.upsampler_checkpoint,
                                      args.jbu_stages)

    results = run_eval(args.config, work_dir=args.work_dir, shard=(rank, world),
                       max_samples=args.max_samples, model_overrides=overrides,
                       save_seg_dir=save_seg_dir, save_heatmap_dir=save_heatmap_dir,
                       batch_images=args.batch_images)
    print(json.dumps({k: results[k] for k in
                      ("aAcc", "mIoU", "mAcc", "num_images", "tiles512_per_sec",
                       "tiles512_per_sec_steady", "img_per_sec_sustained",
                       "tiles512_per_sec_sustained") if k in results},
                     indent=2))


if __name__ == "__main__":
    main()
