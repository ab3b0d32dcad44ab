from .iou import IouEval, iou_from_confusion, confusion_matrix_update
