"""Torch->JAX checkpoint conversion: golden parity with the reference NCSN++.

The fixture (``tests/golden/ncsnpp_torch_golden.npz``, generated once by
``scripts/make_ncsnpp_golden.py`` from the reference torch model on CPU)
contains a randomly-initialized reference state dict and an input/output
pair. Converting that state dict with
``torch_ckpt.convert_ncsnpp_state_dict`` and running our flax NCSNpp must
reproduce the reference output — proving both the converter and the
architectural fidelity of the JAX re-design
(reference ``sgmse/backbones/ncsnpp.py``).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models.sgmse.ncsnpp import NCSNpp
from task_aware_audio_coding_perceptual_tpu.models.sgmse import torch_ckpt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ncsnpp_torch_golden.npz")


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return sd, data["x"], data["t"], data["out"]


def test_ncsnpp_torch_parity(golden):
    sd, x, t, ref_out = golden
    model = NCSNpp(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1,
                   attn_resolutions=(16,))
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    converted = torch_ckpt.convert_ncsnpp_state_dict(sd, params)
    out = model.apply(converted, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=2e-4)


def test_convert_rejects_mismatched_module_count(golden):
    sd, x, t, _ = golden
    model = NCSNpp(nf=16, ch_mult=(1, 1, 2), num_res_blocks=2,  # != fixture
                   attn_resolutions=(16,))
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))
    with pytest.raises(ValueError, match="module-count mismatch"):
        torch_ckpt.convert_ncsnpp_state_dict(sd, params)


def test_lightning_checkpoint_roundtrip(tmp_path, golden):
    """Full .ckpt path: save a Lightning-layout checkpoint (state_dict with
    'dnn.' prefix + ema shadow params), load with use_ema, verify the EMA
    weights are the ones that land in the flax tree."""
    torch = pytest.importorskip("torch")
    sd, x, t, _ = golden

    live = {f"dnn.{k}": torch.from_numpy(v.copy()) for k, v in sd.items()}
    shadow = [torch.from_numpy(v.copy()) * 0.5 for v in sd.values()]
    ckpt = {"state_dict": live,
            "ema": {"decay": 0.999, "num_updates": 10, "shadow_params": shadow}}
    path = tmp_path / "score.ckpt"
    torch.save(ckpt, path)

    model = NCSNpp(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1,
                   attn_resolutions=(16,))
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t))

    p_live = torch_ckpt.load_lightning_score_checkpoint(
        str(path), params, use_ema=False)
    p_ema = torch_ckpt.load_lightning_score_checkpoint(
        str(path), params, use_ema=True)

    a = jax.tree.leaves(p_live["params"])[0]
    b = jax.tree.leaves(p_ema["params"])[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) * 0.5, rtol=1e-6)
