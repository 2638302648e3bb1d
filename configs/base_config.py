# base configuration — the production recipe
# (mirrors reference configs/base_config.py:2-25; loaded by rs_ov.evalsuite.config)
model = dict(
    type='SegmentorEx',
    clip_type='CLIP',
    vit_type='ViT-B/16',
    model_type='Experimental',
    ignore_residual=True,
    apply_sim_feat_up=True,
    cls_token_lambda=0.0,
    global_debias_factor=0.2,
    apply_outlier_suppression=True,
    outlier_suppression_cfg=dict(
        top_k=30,
    ),
    apply_similarity_enhancement=True,
    similarity_enhancement_cfg=dict(
        similarity_weight=1.0,
        temperature=1.0,
        add_self_similarity=True,
    ),
    sim_feat_up_cfg=dict(
        model_name='jbu_one',
        model_path='weights/xclip_jbu_one_million_aid.ckpt'),
)

test_evaluator = dict(type='IoUMetric', iou_metrics=['mIoU'])
