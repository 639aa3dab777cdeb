"""Generate the NCSN++ torch-parity golden fixture.

Runs the *reference* torch NCSNpp (from /root/reference, if present) at a
tiny config on CPU, and saves its randomly-initialized state dict plus an
input/output pair to ``tests/golden/ncsnpp_torch_golden.npz``. The committed
fixture lets ``tests/test_torch_ckpt.py`` prove that
``torch_ckpt.convert_ncsnpp_state_dict`` + our flax NCSNpp reproduce the
reference network's function without needing torch or the reference repo at
test time.

Config must mirror tests/test_torch_ckpt.py: nf=16, ch_mult=(1,1,2),
num_res_blocks=1, attn_resolutions=(16,), image 64x64.
"""

import os
import sys

import numpy as np

REF = "/root/reference/sgmse"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "ncsnpp_torch_golden.npz")


def main():
    sys.path.insert(0, REF)
    import torch
    from sgmse.backbones.ncsnpp import NCSNpp

    torch.manual_seed(0)
    m = NCSNpp(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1,
               attn_resolutions=(16,), image_size=64)
    m.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 64, 64)) + 1j * rng.standard_normal((2, 2, 64, 64))
    x = x.astype(np.complex64)
    t = np.array([0.5, 0.9], np.float32)

    with torch.no_grad():
        out = m(torch.from_numpy(x), torch.from_numpy(t))

    payload = {f"sd/{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    payload["x"] = x
    payload["t"] = t
    payload["out"] = out.numpy()
    np.savez_compressed(os.path.abspath(OUT), **payload)
    print(f"wrote {os.path.abspath(OUT)} ({len(payload)} arrays, "
          f"out shape {out.shape})")


if __name__ == "__main__":
    main()
