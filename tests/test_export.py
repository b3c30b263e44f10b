"""jax.export serving artifact: serialize → deserialize → numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from deepfakedetection_tpu.train.steps import init_model_variables
from tests.util import TinyCNN


def test_export_roundtrip_matches_forward():
    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, bs = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))

    def forward(params, bs, x):
        return jax.nn.softmax(
            model.apply({"params": params, "batch_stats": bs}, x, train=False), axis=-1
        )

    exported = jax_export.export(jax.jit(forward))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), bs),
        jax.ShapeDtypeStruct((4, 32, 32, 3), jnp.float32),
    )
    blob = exported.serialize()
    assert len(blob) > 0
    restored = jax_export.deserialize(blob)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(restored.call(params, bs, x)),
        np.asarray(forward(params, bs, x)),
        atol=1e-6,
    )
