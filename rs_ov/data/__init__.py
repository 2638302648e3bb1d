from rs_ov.data.datasets import DATASETS, DatasetMeta, get_dataset_meta  # noqa: F401
from rs_ov.data.transforms import preprocess_image  # noqa: F401
