"""Full fast-path inference (all Pallas kernels) vs the XLA oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.inference import build_fast_infer


def test_fast_infer_matches_xla_fp32():
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 256, 3))

    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    ref_logits, ref_pred = ref_fn(x)
    logits, pred = fast_fn(x)
    assert logits.shape == ref_logits.shape == (1, 128, 256, 20)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    agree = (np.asarray(pred) == np.asarray(ref_pred)).mean()
    assert agree > 0.999, agree


def test_fast_infer_odd_shape_falls_back():
    """Shapes the kernels can't take still produce correct results (XLA
    fallback inside layer_fn)."""
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 48, 3))
    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fast_fn(x)[0]),
                               np.asarray(ref_fn(x)[0]),
                               rtol=2e-3, atol=2e-3)


def test_streaming_segmenter(fake_cityscapes):
    from erfnet_pytorch_tpu.streaming import StreamingSegmenter
    from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
    from erfnet_pytorch_tpu.data.loader import DataLoader

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    seg = StreamingSegmenter(params, state, dtype=jnp.float32,
                             use_pallas=False, output="color")
    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    dl = DataLoader(ds, 2, num_workers=2)
    outs = list(seg.run(dl))
    assert len(outs) == 3
    rgb, rels = outs[0]
    assert rgb.shape == (2, 64, 128, 3) and rgb.dtype == np.uint8
    assert len(rels) == 2

    seg = StreamingSegmenter(params, state, dtype=jnp.float32,
                             use_pallas=False, output="labelId")
    ids, _ = next(iter(seg.run(DataLoader(ds, 2, num_workers=2))))
    valid = {7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
             31, 32, 33, 0}
    assert set(np.unique(ids)).issubset(valid)


def test_fast_argmax_matches_jnp_argmax():
    from erfnet_pytorch_tpu.inference import fast_argmax
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 20))
    np.testing.assert_array_equal(np.asarray(fast_argmax(x)),
                                  np.asarray(jnp.argmax(x, -1)))
    # ties -> first index, like jnp.argmax
    t = jnp.zeros((1, 3, 3, 20))
    np.testing.assert_array_equal(np.asarray(fast_argmax(t)),
                                  np.asarray(jnp.argmax(t, -1)))
