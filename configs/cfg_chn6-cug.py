import os

_base_ = './base_config.py'

# model settings
model = dict(
    name_path='./configs/cls_chn6-cug.txt',
    prob_thd=0.8,
)

# dataset settings
dataset_type = 'CHN6_CUGDataset'
data_root = os.path.abspath('data/CHN6-CUG')

test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='PackSegInputs')
]

test_dataloader = dict(
    batch_size=1,
    num_workers=4,
    sampler=dict(type='DefaultSampler', shuffle=False),
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        data_prefix=dict(
            img_path=f"{data_root}/val/image_cvt",
            seg_map_path=f"{data_root}/val/label_cvt"),
        pipeline=test_pipeline))
