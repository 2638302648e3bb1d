import os

_base_ = './base_config.py'

# model settings
model = dict(
    name_path='./configs/cls_openearthmap.txt',
    prob_thd=0.1,
)

# dataset settings
dataset_type = 'OpenEarthMapDataset'
data_root = os.path.abspath('data/OpenEarthMap')

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
        reduce_zero_label=False,
        data_prefix=dict(
            img_path=f"{data_root}/img_dir/val",
            seg_map_path=f"{data_root}/ann_dir/val"),
        pipeline=test_pipeline))
