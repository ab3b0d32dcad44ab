from .nb1d import (fuse_nb1d_params, nb1d_infer, make_encoder_layer_fn,
                   nb1d_supported)
