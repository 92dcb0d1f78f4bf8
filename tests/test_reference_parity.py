"""END-TO-END parity against the ACTUAL reference implementation.

Loads the reference's DeepLabV2 (``/root/reference/models/deeplabv2`` --
pure torch, no torchvision dependency) at test time, exports its randomly
initialized state dict, converts it through our checkpoint pipeline
(``rtsds_tpu/models/pretrained.py``), and checks our Flax model reproduces
the reference logits on the same input.  This exercises the BASELINE.md
fidelity gate ("logits within tolerance on identical images") against the
real reference code, plus the state-dict converter end to end.

The reference tree is imported read-only from disk; nothing is copied.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DEEPLAB = "/root/reference/models/deeplabv2/deeplabv2.py"


def _load_reference_deeplab():
    if not os.path.exists(REFERENCE_DEEPLAB):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_deeplabv2",
                                                  REFERENCE_DEEPLAB)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_deeplab_matches_reference_with_converted_weights(key, rng):
    ref_mod = _load_reference_deeplab()
    torch.manual_seed(0)
    ref_model = ref_mod.ResNetMulti(ref_mod.Bottleneck, [3, 4, 23, 3], 19)
    ref_model.eval()

    x = rng.normal(size=(1, 65, 97, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.permute(0, 2, 3, 1).numpy()

    # our model, loaded with the reference's weights via the converter
    from rtsds_tpu.models.deeplabv2 import DeepLabV2
    from rtsds_tpu.models.pretrained import convert_torch_state_dict, merge_pretrained

    model = DeepLabV2(num_classes=19)
    variables = dict(model.init(key, jnp.asarray(x), train=False))
    converted = convert_torch_state_dict(ref_model.state_dict())
    variables = merge_pretrained(variables, converted, verbose=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)
