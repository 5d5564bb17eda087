"""RAFT baseline parity vs the reference's vendored torch RAFT (random weights)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_raft():
    for p in (REFERENCE_DIR, f"{REFERENCE_DIR}/nets/raft_core"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from raft import RAFT as TorchRAFT  # noqa: E402

    import argparse
    args = argparse.Namespace(small=False, mixed_precision=False, alternate_corr=False)
    torch.manual_seed(42)
    model = TorchRAFT(args)
    model.eval()
    return model


@requires_reference
def test_raft_forward_parity(torch_raft):
    from pips_tpu.models.raft import RAFT
    from pips_tpu.torchport.convert import convert_raft_state_dict

    sd = {k: v.detach().numpy() for k, v in torch_raft.state_dict().items()}
    variables = convert_raft_state_dict(sd)

    rng = np.random.RandomState(0)
    # H/8 must be >= 16 so no corr-pyramid level degenerates to 1x1
    # (the reference's grid normalization divides by (size-1) -> NaN there)
    B, H, W = 1, 128, 160
    img1 = (rng.rand(B, H, W, 3) * 255).astype(np.float32)
    img2 = (rng.rand(B, H, W, 3) * 255).astype(np.float32)

    t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
    with torch.no_grad():
        out = torch_raft(t1, t2, iters=2, test_mode=True)
    flow_low_t, flow_up_t = out[0], out[1]

    model = RAFT()
    with jax.default_matmul_precision("highest"):
        flow_low, flow_up = model.apply(variables, jnp.asarray(img1),
                                        jnp.asarray(img2), iters=2)

    # GRU recurrence + random (untrained) weights amplify fp reassociation
    # noise; tolerance is absolute-dominant (flow units: pixels)
    np.testing.assert_allclose(np.asarray(flow_low),
                               flow_low_t.permute(0, 2, 3, 1).numpy(),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(flow_up),
                               flow_up_t.permute(0, 2, 3, 1).numpy(),
                               rtol=0.05, atol=0.05)
