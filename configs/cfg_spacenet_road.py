import os

_base_ = './base_config.py'

# model settings
model = dict(
    name_path='./configs/cls_roadval.txt',
    prob_thd=0.7,
)

# dataset settings
dataset_type = 'RoadValDataset'
data_root = os.path.abspath('data/GlobalRoadSet_Val/SpaceNet_test_567')

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
            img_path=f"{data_root}/img",
            seg_map_path=f"{data_root}/label_cvt"),
        pipeline=test_pipeline))
