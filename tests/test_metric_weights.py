"""Published-layout weight-loader validation (VERDICT round-1 item 6).

The fixtures in tests/fixtures/ pin the EXACT key layouts of the published
metric weights (torchvision/pytorch_fid InceptionV3, tfhub Kinetics-400 I3D,
torchvision VGG16/19, the lpips package's linear heads). These tests
synthesize state dicts with those keys/shapes, run the converters, and verify
the result drops into the flax models exactly — so published-weight parity is
a file-drop away and a wrong file fails loudly.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.compat import metric_weights as mw

from playableenvironments_tpu.compat.weight_validation import (
    LAYOUTS_DIR as FIXTURES,
    synthesize_state,
)


def synth_state(fixture_name, seed=0):
    return synthesize_state(fixture_name, seed)


def _flat(tree):
    return {
        jax.tree_util.keystr(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def assert_same_tree(converted, expected, what, allow_extra=False):
    flat_c, flat_e = _flat(converted), _flat(expected)
    missing = sorted(set(flat_e) - set(flat_c))
    extra = sorted(set(flat_c) - set(flat_e))
    assert not missing, f"{what}: converted tree is missing {missing[:4]}"
    if not allow_extra:
        assert not extra, f"{what}: converted tree has extra {extra[:4]}"
    for path, leaf in flat_e.items():
        assert flat_c[path].shape == leaf.shape, (
            f"{what}: shape mismatch at {path}: "
            f"{flat_c[path].shape} vs {leaf.shape}"
        )


def test_inception_torch_layout_roundtrip():
    from playableenvironments_tpu.eval.inception_v3 import InceptionV3Features

    state = synth_state("inception_v3_torch_keys.json")
    # The real file also carries classifier keys; they must be tolerated.
    state["fc.weight"] = np.zeros((1008, 2048), np.float32)
    state["fc.bias"] = np.zeros((1008,), np.float32)
    state["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros((), np.int64)
    variables = mw.convert_torch_inception_state_dict(state)

    model = InceptionV3Features()
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    )
    assert_same_tree(variables, expected, "inception")
    out = model.apply(variables, jnp.zeros((1, 75, 75, 3)), train=False)
    assert out.shape == (1, 2048) and np.isfinite(np.asarray(out)).all()


def test_inception_missing_key_fails_loudly():
    state = synth_state("inception_v3_torch_keys.json")
    del state["Mixed_6b.branch7x7_1.conv.weight"]
    with pytest.raises(KeyError, match="torchvision/pytorch_fid layout"):
        mw.convert_torch_inception_state_dict(state)


def test_inception_unrecognized_key_fails_loudly():
    state = synth_state("inception_v3_torch_keys.json")
    state["Mixed_8a.branch1x1.conv.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    with pytest.raises(KeyError, match="unrecognized"):
        mw.convert_torch_inception_state_dict(state)


def test_i3d_tfhub_layout_roundtrip():
    from playableenvironments_tpu.eval.i3d import I3D

    variables = mw.convert_tfhub_i3d_variables(synth_state("i3d_tfhub_keys.json"))
    model = I3D()
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 32, 32, 3)))
    )
    assert_same_tree(variables, expected, "i3d")
    out = model.apply(variables, jnp.zeros((1, 9, 32, 32, 3)), train=False)
    assert out.shape == (1, 400) and np.isfinite(np.asarray(out)).all()


def test_i3d_missing_key_fails_loudly():
    state = synth_state("i3d_tfhub_keys.json")
    del state["RGB/inception_i3d/Mixed_4d/Branch_2/Conv3d_0b_3x3/conv_3d/w"]
    with pytest.raises(KeyError, match="tfhub"):
        mw.convert_tfhub_i3d_variables(state)


def test_vgg19_torch_layout_roundtrip(tmp_path):
    import torch

    from playableenvironments_tpu.eval.perceptual import (
        VGG19_CUTS,
        VGG19_PLAN,
        VGGFeatures,
    )

    state = {
        k: torch.from_numpy(v)
        for k, v in synth_state("vgg19_torch_keys.json").items()
    }
    path = tmp_path / "vgg19.pth"
    torch.save(state, str(path))
    from playableenvironments_tpu.eval.perceptual import load_torch_vgg_weights

    variables, pretrained = load_torch_vgg_weights(str(path))
    assert pretrained
    model = VGGFeatures(VGG19_PLAN, VGG19_CUTS)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    # The loader converts the FULL torchvision plan; the cut model only reads
    # a prefix (flax ignores unused entries), so extras are expected.
    assert_same_tree(variables, expected, "vgg19", allow_extra=True)
    outs = model.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert len(outs) == 5


def test_lpips_layout_roundtrip():
    from playableenvironments_tpu.eval.perceptual import LPIPS

    variables = mw.convert_lpips_state_dict(
        synth_state("lpips_vgg_keys.json"),
        synth_state("vgg16_torch_keys.json"),
    )
    model = LPIPS()
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )
    )
    assert_same_tree(variables, expected, "lpips")
    out = model.apply(
        variables, jnp.zeros((2, 32, 32, 3)), jnp.ones((2, 32, 32, 3)) * 0.5
    )
    assert out.shape == (2,) and np.isfinite(np.asarray(out)).all()


def test_lpips_missing_lin_fails_loudly():
    lins = synth_state("lpips_vgg_keys.json")
    del lins["lin3.model.1.weight"]
    with pytest.raises(KeyError, match="lpips"):
        mw.convert_lpips_state_dict(lins, synth_state("vgg16_torch_keys.json"))


# ---------------------------------------------------------------------------
# Golden activation signatures (r2 verdict item 5: executable parity verdict
# instead of a leap of faith; reference embedders: pytorch_fid/inception.py:322,
# evaluation/metrics/fvd.py:32-34, the lpips package)
# ---------------------------------------------------------------------------


def test_synthetic_self_check_passes_shipped_goldens():
    from playableenvironments_tpu.compat import weight_validation as wv

    signatures = wv.compute_signatures(wv.synthetic_variables())
    report = wv.compare_signatures(signatures, wv.load_goldens())
    assert {v["status"] for v in report.values()} == {"PASS"}, report


def test_partial_coverage_reports_missing():
    """Golden entries with no computed counterpart surface as MISSING
    (round-3 advisor: a subset run must not read as full validation)."""
    from playableenvironments_tpu.compat import weight_validation as wv

    golden = wv.load_goldens()
    subset = {"vgg19": wv.synthetic_variables()["vgg19"]}
    report = wv.compare_signatures(wv.compute_signatures(subset), golden)
    assert report["vgg19"]["status"] == "PASS"
    uncovered = set(golden) - {"vgg19"}
    assert uncovered and all(
        report[name]["status"] == "MISSING" for name in uncovered
    )


def test_perturbed_weights_fail_goldens():
    """A single perturbed conv kernel must flip the verdict — the check has
    actual discriminating power."""
    from playableenvironments_tpu.compat import weight_validation as wv

    variables = wv.synthetic_variables()
    kernel = variables["inception_v3"]["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]
    variables["inception_v3"]["params"]["Conv2d_1a_3x3"]["conv"]["kernel"] = (
        kernel + 0.01
    )
    signatures = wv.compute_signatures(
        {"inception_v3": variables["inception_v3"]}
    )
    report = wv.compare_signatures(signatures, wv.load_goldens())
    assert report["inception_v3"]["status"] == "FAIL"


def test_validate_cli_over_synthesized_archives(tmp_path):
    """The real file path: synthesized .pth/.npz archives in the published
    layouts -> CLI --write_goldens -> CLI --goldens compare passes."""
    import subprocess
    import sys

    torch = pytest.importorskip("torch")
    from playableenvironments_tpu.compat.weight_validation import (
        synthesize_state,
    )

    inception_path = os.path.join(tmp_path, "inception.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         synthesize_state("inception_v3_torch_keys.json").items()},
        inception_path,
    )
    i3d_path = os.path.join(tmp_path, "i3d.npz")
    np.savez(i3d_path, **synthesize_state("i3d_tfhub_keys.json", seed=1))
    lins_path = os.path.join(tmp_path, "lpips.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         synthesize_state("lpips_vgg_keys.json", seed=2).items()},
        lins_path,
    )
    vgg16_path = os.path.join(tmp_path, "vgg16.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         synthesize_state("vgg16_torch_keys.json", seed=3).items()},
        vgg16_path,
    )
    vgg19_path = os.path.join(tmp_path, "vgg19.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         synthesize_state("vgg19_torch_keys.json", seed=4).items()},
        vgg19_path,
    )

    def run_cli(*args):
        from playableenvironments_tpu.cli import validate_metric_weights

        argv = sys.argv
        sys.argv = ["validate_metric_weights"] + list(args)
        try:
            validate_metric_weights.main()
        finally:
            sys.argv = argv

    file_args = [
        "--inception", inception_path, "--i3d", i3d_path,
        "--lpips_lins", lins_path, "--vgg16", vgg16_path,
        "--vgg19", vgg19_path,
    ]
    goldens_path = os.path.join(tmp_path, "goldens.json")
    run_cli(*file_args, "--write_goldens", goldens_path)
    assert os.path.isfile(goldens_path)
    run_cli(*file_args, "--goldens", goldens_path)  # must not raise

    # These archives are byte-equal to the synthetic self-check's state
    # dicts, so their recorded signatures must equal the shipped goldens
    # (the file loaders and the in-memory converters are one code path).
    recorded = json.load(open(goldens_path))
    from playableenvironments_tpu.compat import weight_validation as wv

    report = wv.compare_signatures(recorded, wv.load_goldens())
    assert {v["status"] for v in report.values()} == {"PASS"}, report

    # Real weight files WITHOUT --goldens/--write_goldens must error loudly:
    # comparing them against the shipped synthetic goldens would always FAIL.
    with pytest.raises(SystemExit, match="write_goldens"):
        run_cli(*file_args)
    # --vgg16 alone is the LPIPS backbone, not a standalone check.
    with pytest.raises(SystemExit, match="lpips"):
        run_cli("--vgg16", vgg16_path, "--goldens", goldens_path)
