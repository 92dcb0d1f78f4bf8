"""Cityscapes palette and label<->color maps.

Single source of truth for the tables the reference duplicates in two
places: the 19-class display palette (``utils.py:11-31``) and the 35-entry
Cityscapes label map name -> (trainId, RGB) used for GTA5 label decoding
(``gta5.py:10-46``).
"""

from __future__ import annotations

import numpy as np

CLASS_NAMES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]

NUM_CLASSES = 19
IGNORE_INDEX = 19  # labels are clamped to [0, 19]; 19 is CE ignore_index
VOID_TRAIN_ID = 255  # raw void id before clamping

# trainId -> display RGB for the 19 classes (utils.py:11-31)
TRAIN_ID_TO_COLOR = np.array([
    [128, 64, 128],   # road
    [244, 35, 232],   # sidewalk
    [70, 70, 70],     # building
    [102, 102, 156],  # wall
    [190, 153, 153],  # fence
    [153, 153, 153],  # pole
    [250, 170, 30],   # traffic light
    [220, 220, 0],    # traffic sign
    [107, 142, 35],   # vegetation
    [152, 251, 152],  # terrain
    [70, 130, 180],   # sky
    [220, 20, 60],    # person
    [255, 0, 0],      # rider
    [0, 0, 142],      # car
    [0, 0, 70],       # truck
    [0, 60, 100],     # bus
    [0, 80, 100],     # train
    [0, 0, 230],      # motorcycle
    [119, 11, 32],    # bicycle
], dtype=np.uint8)

# Full Cityscapes semantic map: name -> (trainId, RGB).  Void classes map to
# 255 (gta5.py:10-46).  Order preserved from the reference table.
CITYSCAPES_LABEL_MAP: dict[str, tuple[int, tuple[int, int, int]]] = {
    "unlabeled": (255, (0, 0, 0)),
    "ego vehicle": (255, (0, 0, 0)),
    "rectification border": (255, (0, 0, 0)),
    "out of roi": (255, (0, 0, 0)),
    "static": (255, (0, 0, 0)),
    "dynamic": (255, (111, 74, 0)),
    "ground": (255, (81, 0, 81)),
    "road": (0, (128, 64, 128)),
    "sidewalk": (1, (244, 35, 232)),
    "parking": (255, (250, 170, 160)),
    "rail track": (255, (230, 150, 140)),
    "building": (2, (70, 70, 70)),
    "wall": (3, (102, 102, 156)),
    "fence": (4, (190, 153, 153)),
    "guard rail": (255, (180, 165, 180)),
    "bridge": (255, (150, 100, 100)),
    "tunnel": (255, (150, 120, 90)),
    "pole": (5, (153, 153, 153)),
    "polegroup": (255, (153, 153, 153)),
    "traffic light": (6, (250, 170, 30)),
    "traffic sign": (7, (220, 220, 0)),
    "vegetation": (8, (107, 142, 35)),
    "terrain": (9, (152, 251, 152)),
    "sky": (10, (70, 130, 180)),
    "person": (11, (220, 20, 60)),
    "rider": (12, (255, 0, 0)),
    "car": (13, (0, 0, 142)),
    "truck": (14, (0, 0, 70)),
    "bus": (15, (0, 60, 100)),
    "caravan": (255, (0, 0, 90)),
    "trailer": (255, (0, 0, 110)),
    "train": (16, (0, 80, 100)),
    "motorcycle": (17, (0, 0, 230)),
    "bicycle": (18, (119, 11, 32)),
    "license plate": (-1, (0, 0, 142)),
}


def class_colors_for_remap() -> np.ndarray:
    """(19, 3) uint8 array: RGB key for each trainId 0..18.

    This is the lookup the reference's ``__decode_label__`` loop performs
    one class at a time (``gta5.py:111-118``); the vectorized/Pallas remap
    kernels consume this table.
    """
    colors = np.zeros((NUM_CLASSES, 3), dtype=np.uint8)
    for train_id, rgb in CITYSCAPES_LABEL_MAP.values():
        if 0 <= train_id < NUM_CLASSES:
            colors[train_id] = rgb
    return colors


def apply_color_map(segmentation_map: np.ndarray) -> np.ndarray:
    """trainId map (H, W) -> RGB image (H, W, 3) (``utils.py:146-152``).

    Ids outside [0, 19) render black, matching the reference's zero-init.
    """
    seg = np.asarray(segmentation_map)
    out = np.zeros((*seg.shape, 3), dtype=np.uint8)
    valid = (seg >= 0) & (seg < NUM_CLASSES)
    out[valid] = TRAIN_ID_TO_COLOR[seg[valid].astype(np.int64)]
    return out
