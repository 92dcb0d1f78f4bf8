from rtsds_tpu.data.indexing import build_cityscapes_index, build_gta5_index  # noqa: F401
from rtsds_tpu.data.pipeline import DataLoader, SegmentationDataset  # noqa: F401
from rtsds_tpu.data.synthetic import SyntheticSegDataset  # noqa: F401
