from .transforms import (CITYSCAPES_PALETTE, CLASS_NAMES,
                         TRAINID_TO_LABELID, relabel, colorize,
                         to_label, train_id_to_label_id)
from .cityscapes import CityscapesDataset
from .loader import DataLoader
