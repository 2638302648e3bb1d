import os

_base_ = './base_config.py'

# model settings
model = dict(
    name_path='./configs/cls_wbs-si.txt',
    prob_thd=0.6,
)

# dataset settings
dataset_type = 'WaterDataset'
data_root = os.path.abspath('data/water-body-segmentation-in-satellite-images/WaterBodiesDatasetPreprocessed/WaterBodiesDatasetPreprocessed')

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
            img_path=f"{data_root}/Images",
            seg_map_path=f"{data_root}/Masks_cvt"),
        pipeline=test_pipeline))
