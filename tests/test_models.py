"""Model zoo shape/compile tests (CPU, small inputs).

The reference has no tests; these verify each family builds, forwards with
the right output shape, and round-trips through train/eval modes
(SURVEY.md §4's rebuild plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapping_tpu.models import (
    UNet,
    UNet11,
    UNetMultitask,
    UNetResNet,
    UNetVGG16,
    build_network,
)


def _init_and_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)
    out = model.apply(
        variables,
        x,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return out, variables


def test_unet_resnet34_shapes():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model = UNetResNet(encoder_depth=34, num_classes=2, num_filters=8,
                       dtype=jnp.float32)
    out, variables = _init_and_apply(model, x)
    assert out.shape == (1, 64, 64, 2)
    assert out.dtype == jnp.float32
    assert "batch_stats" in variables


def test_unet_resnet101_builds():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model = UNetResNet(encoder_depth=101, num_classes=2, num_filters=4,
                       dtype=jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 64, 64, 2)


def test_unet_resnet_train_mode_updates_bn():
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    model = UNetResNet(encoder_depth=34, num_classes=2, num_filters=4,
                       dropout_2d=0.2, dtype=jnp.float32)
    out, _ = _init_and_apply(model, x, train=True)
    assert out.shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_vgg_unets():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out11, _ = _init_and_apply(UNet11(num_filters=4, dtype=jnp.float32), x)
    out16, _ = _init_and_apply(UNetVGG16(num_filters=4, dtype=jnp.float32), x)
    assert out11.shape == (1, 64, 64, 2)
    assert out16.shape == (1, 64, 64, 2)


def test_scratch_unet_and_multitask():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out, _ = _init_and_apply(
        UNet(n_filters=4, repeat_blocks=2, dtype=jnp.float32), x)
    assert out.shape == (1, 32, 32, 2)
    outs, _ = _init_and_apply(
        UNetMultitask(n_filters=4, repeat_blocks=2, nr_outputs=3,
                      dtype=jnp.float32), x)
    assert len(outs) == 3 and outs[0].shape == (1, 32, 32, 2)


def test_registry_build():
    model = build_network({"encoder": "ResNet34", "num_filters": 4},
                          dtype=jnp.float32)
    assert isinstance(model, UNetResNet)
    model = build_network(
        {"encoder": "from_scratch", "n_filters": 4, "repeat_blocks": 2})
    assert isinstance(model, UNet)
    with pytest.raises(KeyError):
        build_network({"encoder": "nope"})


def test_torch_convert_vgg_features():
    """VGG conversion: features.N.weight/bias -> conv_N kernel/bias graft."""
    import flax

    from mapping_tpu.models.torch_convert import convert_vgg_features

    model = UNet11(num_filters=4, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    rng = np.random.RandomState(0)
    state = {}
    for name, leaf in params.items():
        if not name.startswith("conv_"):
            continue
        idx = name.split("_")[1]
        k = leaf["kernel"]
        state[f"features.{idx}.weight"] = np.transpose(
            rng.randn(*np.shape(k)), (3, 2, 0, 1)).astype(np.float32)
        state[f"features.{idx}.bias"] = rng.randn(
            *np.shape(leaf["bias"])).astype(np.float32)
    converted = convert_vgg_features(state)
    new_params = dict(params)
    for name, leaves in converted.items():
        assert np.shape(new_params[name]["kernel"]) == np.shape(leaves["kernel"])
        new_params[name] = leaves
    out = model.apply({"params": new_params}, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(
        np.asarray(new_params["conv_0"]["kernel"]),
        np.transpose(state["features.0.weight"], (2, 3, 1, 0)))


def test_torch_convert_resnet_roundtrip():
    """Fabricate a torchvision-shaped state_dict and graft it in."""
    import flax

    from mapping_tpu.models.torch_convert import (
        convert_resnet_encoder,
        graft_encoder_params,
    )

    model = UNetResNet(encoder_depth=34, num_classes=2, num_filters=4,
                       dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    enc_params = variables["params"]["encoder"]

    # Build a fake torch state_dict with matching shapes.
    state = {}
    flat = flax.traverse_util.flatten_dict(enc_params)

    def torch_name(path):
        mod = list(path)
        if mod[0] in ("conv1", "bn1"):
            return mod[0]
        layer, block = mod[0].rsplit("_", 1)
        sub = mod[1]
        if sub == "downsample_conv":
            return f"{layer}.{block}.downsample.0"
        if sub == "downsample_bn":
            return f"{layer}.{block}.downsample.1"
        return f"{layer}.{block}.{sub}"

    rng = np.random.RandomState(0)
    for path, leaf in flat.items():
        name = torch_name(path)
        if path[-1] == "kernel":
            o = np.transpose(rng.randn(*np.shape(leaf)), (3, 2, 0, 1))
            state[name + ".weight"] = o.astype(np.float32)
        elif path[-1] == "scale":
            state[name + ".weight"] = rng.randn(*np.shape(leaf)).astype(np.float32)
        elif path[-1] == "bias":
            state[name + ".bias"] = rng.randn(*np.shape(leaf)).astype(np.float32)
    for path, leaf in flax.traverse_util.flatten_dict(
            variables["batch_stats"]["encoder"]).items():
        name = torch_name(path)
        suffix = "running_mean" if path[-1] == "mean" else "running_var"
        state[f"{name}.{suffix}"] = rng.rand(*np.shape(leaf)).astype(np.float32)

    params, stats = convert_resnet_encoder(state, depth=34)
    new_params = graft_encoder_params(dict(variables["params"]), params)
    new_stats = graft_encoder_params(dict(variables["batch_stats"]), stats)
    out = model.apply(
        {"params": new_params, "batch_stats": new_stats}, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    # conv1 weights must equal the transposed torch tensor
    np.testing.assert_allclose(
        np.asarray(new_params["encoder"]["conv1"]["kernel"]),
        np.transpose(state["conv1.weight"], (2, 3, 1, 0)),
    )


def test_unetplusplus():
    from mapping_tpu.models.unetpp import UNetPlusPlus

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    for deep in (False, True):
        model = UNetPlusPlus(n_filters=4, depth=3, deep_supervision=deep,
                             dtype=jnp.float32)
        out, _ = _init_and_apply(model, x)
        assert out.shape == (1, 32, 32, 2)
    model = build_network({"encoder": "UNetPlusPlus", "n_filters": 4,
                           "depth": 3}, dtype=jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 32, 32, 2)
