from .conv import (
    conv2d,
    conv_transpose2d,
    max_pool2d,
    avg_pool2d,
    init_conv,
    init_conv_transpose,
)
from .batchnorm import batch_norm, init_batch_norm, fold_batch_norm
from .dropout import dropout2d
from .loss import weighted_log_softmax_nll, cross_entropy
from .argmax import fast_argmax
