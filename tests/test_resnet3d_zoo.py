"""3D CNN zoo: shape/finiteness contracts for every variant (tiny inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualvgr_tpu.models.backbones import resnet3d_zoo as zoo

pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "ctor,out_ch",
    [
        (zoo.resnet3d_10, 512),
        (zoo.resnet3d_50, 2048),
        (lambda: zoo.wide_resnet3d_50(k=2), 2048),  # 512*2*2
        (zoo.pre_act_resnet3d_50, 2048),
    ],
)
def test_resnet_variants(ctor, out_ch, rng):
    m = ctor()
    x = jnp.asarray(rng.rand(2, 8, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, out_ch)
    assert np.isfinite(np.asarray(out)).all()


def test_shortcut_type_a(rng):
    m = zoo.ResNet3D(layers=(1, 1, 1, 1), block="basic", shortcut_type="A")
    x = jnp.asarray(rng.rand(1, 4, 16, 16, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 512)
    # type A adds no projection parameters
    flat = jax.tree_util.tree_leaves(variables["params"])
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "downsample_conv" not in names


def test_densenet121(rng):
    m = zoo.densenet3d_121()
    # three avg-pool transitions halve T; 16 frames keeps all dims >= 1
    x = jnp.asarray(rng.rand(1, 16, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(2), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 1024)  # densenet121 final features
    assert np.isfinite(np.asarray(out)).all()
